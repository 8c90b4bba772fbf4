"""Model zoo. Importing this package registers every model builder."""
from fac_fake_tpu.core.registry import available, get

from . import cvit  # noqa: F401  (registers cvit, cvit_repbn8)
from . import resnet  # noqa: F401  (registers reskan, resvitkan)
from .s3d import model as _s3d_model  # noqa: F401  (registers the S3D family)


def build_model(cfg):
    """Construct a model from a ModelConfig via the registry."""
    return get("model", cfg.name)(cfg)
