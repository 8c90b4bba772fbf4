"""Model zoo. Importing this package registers every model builder."""
from fac_fake_tpu.core.registry import available, get

from . import cvit  # noqa: F401  (registers cvit, cvit_repbn8)
from . import resnet  # noqa: F401  (registers reskan, resvitkan)
from .s3d import model as _s3d_model  # noqa: F401  (registers the S3D family)


def build_model(cfg):
    """Construct a model from a ModelConfig via the registry."""
    return get("model", cfg.name)(cfg)


def init_variables(model, input_shape, train: bool = False, seed: int = 0):
    """`model.init` under jit: ONE compiled execution instead of hundreds of
    eager dispatches. Through the axon relay (~25 ms per dispatch) eager
    init of the base CViT measures ~123 s; jitted it's ~6 s. Use this for
    every template/weight initialization on a real-device path."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def _init(key):
        return model.init(key, jnp.zeros(input_shape, jnp.float32),
                          train=train)

    return _init(jax.random.key(seed))
