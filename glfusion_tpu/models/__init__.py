"""Model zoo: GL-Fusion flagship, ablation variants, and baseline families."""

from glfusion_tpu.models.resnet import ResNetIEKD  # noqa: F401
from glfusion_tpu.models.aspp import ASPP, DeepLabHead  # noqa: F401
from glfusion_tpu.models.tpavi import TPAVI  # noqa: F401
from glfusion_tpu.models.glfusion import GlobalAndLocal  # noqa: F401
