from cadrays_tpu.core import (  # noqa: F401
    bsdf,
    camera,
    fresnel,
    lights,
    rng,
    sampling,
    tonemap,
    vecmath,
)
