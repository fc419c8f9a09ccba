"""Native baseline JPEG decoder (utils/jpeg.py).

Fixtures are written with PIL at test time (PIL is the independent
reference codec here, like the cross-checks in test_io_formats), at
multiple subsampling modes and with restart markers — the features of
the reference's stb_image read path for data/maps/default.jpg.
"""
import numpy as np
import pytest

PIL = pytest.importorskip("PIL.Image")


def _checker(w=96, h=64):
    y, x = np.mgrid[0:h, 0:w]
    r = ((x // 8 + y // 8) % 2) * 200 + 30
    g = np.clip(x * 255 // w, 0, 255)
    b = np.clip(y * 255 // h, 0, 255)
    return np.stack([r, g, b], -1).astype(np.uint8)


@pytest.mark.parametrize("subsampling,qual,tol", [
    (0, 95, 0.04),   # 4:4:4
    (1, 90, 0.08),   # 4:2:2
    (2, 85, 0.12),   # 4:2:0
])
def test_roundtrip_subsampling(tmp_path, subsampling, qual, tol):
    from cadrays_tpu.utils.jpeg import read_jpeg

    src = _checker()
    p = tmp_path / "t.jpg"
    PIL.fromarray(src).save(str(p), quality=qual, subsampling=subsampling)
    ours = read_jpeg(str(p))
    theirs = np.asarray(PIL.open(str(p)).convert("RGB"),
                        np.float32) / 255.0
    # decoder agreement: both decode the same bitstream
    assert np.abs(ours - theirs).max() < 0.02
    # and the content survived the lossy encode
    assert np.abs(ours - src.astype(np.float32) / 255.0).mean() < tol


def test_restart_markers(tmp_path):
    from cadrays_tpu.utils.jpeg import read_jpeg

    src = _checker(128, 96)
    p = tmp_path / "rst.jpg"
    PIL.fromarray(src).save(str(p), quality=92, restart_marker_blocks=4)
    data = (tmp_path / "rst.jpg").read_bytes()
    if b"\xff\xdd" not in data:  # PIL too old to write DRI
        pytest.skip("PIL cannot write restart markers")
    ours = read_jpeg(str(p))
    theirs = np.asarray(PIL.open(str(p)).convert("RGB"),
                        np.float32) / 255.0
    assert np.abs(ours - theirs).max() < 0.02


def test_grayscale(tmp_path):
    from cadrays_tpu.utils.jpeg import read_jpeg

    src = _checker()[:, :, 0]
    p = tmp_path / "g.jpg"
    PIL.fromarray(src, "L").save(str(p), quality=95)
    ours = read_jpeg(str(p))
    assert ours.shape == src.shape + (3,)
    theirs = np.asarray(PIL.open(str(p)).convert("RGB"),
                        np.float32) / 255.0
    assert np.abs(ours - theirs).max() < 0.02


def test_reference_default_envmap():
    import os

    path = "/root/reference/data/maps/default.jpg"
    if not os.path.exists(path):
        pytest.skip("reference mount not present")
    from cadrays_tpu.utils.jpeg import read_jpeg

    img = read_jpeg(path)
    assert img.shape == (1024, 2048, 3)
    theirs = np.asarray(PIL.open(path).convert("RGB"), np.float32) / 255.0
    assert np.abs(img - theirs).max() < 0.02


def test_progressive_refused(tmp_path):
    from cadrays_tpu.utils.jpeg import decode_jpeg

    src = _checker()
    p = tmp_path / "prog.jpg"
    PIL.fromarray(src).save(str(p), quality=90, progressive=True)
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(p.read_bytes())
    # ...but load_image falls back to PIL for it
    from cadrays_tpu.utils.image import load_image

    img = load_image(str(p), to_linear=False)
    assert img.shape == src.shape
