"""Elastic recovery: checkpointed progressive resume (parallel/elastic).

The counter-based RNG makes recovery exactly verifiable: a run that
crashes mid-render and resumes from the checkpoint must produce a
bit-identical accumulator to an uninterrupted run at equal spp.
"""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def small_scene(request):
    from cadrays_tpu.integrator.params import RenderParams
    from cadrays_tpu.testing.scenes import cornell_box, cornell_camera

    scene = cornell_box()
    cam = cornell_camera()
    data = scene.flatten(cam)
    return data, cam, RenderParams(ray_depth=2)


W = H = 24
SPP = 6


def test_recovery_resumes_bit_identical(small_scene, tmp_path):
    from cadrays_tpu.integrator.progressive import progressive_step
    from cadrays_tpu.parallel.elastic import render_with_recovery

    data, cam, params = small_scene

    # ground truth: uninterrupted accumulation
    ref = None
    for _ in range(SPP):
        ref = progressive_step(data, cam, params, W, H, ref, 1)

    # failing run: the step raises once at spp==3, after a checkpoint
    ckpt = str(tmp_path / "acc.npz")
    boom = {"armed": True}

    def flaky_step(data_, cam_, params_, w, h, st, n):
        if boom["armed"] and st is not None and int(st.spp) == 3:
            boom["armed"] = False
            raise RuntimeError("injected preemption")
        return progressive_step(data_, cam_, params_, w, h, st, n)

    out = render_with_recovery(data, cam, params, W, H, SPP, ckpt,
                               checkpoint_every=3, samples_per_step=1,
                               step_fn=flaky_step)
    assert int(out.spp) == SPP
    np.testing.assert_array_equal(np.asarray(out.accum),
                                  np.asarray(ref.accum))


def test_fresh_process_resumes_from_checkpoint(small_scene, tmp_path):
    """Simulate a preempted worker: first 'process' renders 3 spp and
    dies; the second call finds the checkpoint and finishes."""
    from cadrays_tpu.parallel.elastic import render_with_recovery

    data, cam, params = small_scene
    ckpt = str(tmp_path / "acc.npz")

    render_with_recovery(data, cam, params, W, H, 3, ckpt,
                         checkpoint_every=3)
    out = render_with_recovery(data, cam, params, W, H, SPP, ckpt,
                               checkpoint_every=3)
    assert int(out.spp) == SPP


def test_too_many_failures_raise(small_scene, tmp_path):
    from cadrays_tpu.parallel.elastic import render_with_recovery

    data, cam, params = small_scene

    def always_fails(*a, **k):
        raise RuntimeError("dead chip")

    with pytest.raises(RuntimeError, match="dead chip"):
        render_with_recovery(data, cam, params, W, H, 2,
                             str(tmp_path / "a.npz"),
                             step_fn=always_fails, max_failures=2)


def test_init_distributed_noop_single_process():
    from cadrays_tpu.parallel.elastic import init_distributed

    init_distributed()  # no coordinator configured: must be a no-op
