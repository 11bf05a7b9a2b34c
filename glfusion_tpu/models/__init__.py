"""Model zoo: GL-Fusion flagship, ablation variants, and baseline families."""

from glfusion_tpu.models.resnet import ResNetIEKD  # noqa: F401
from glfusion_tpu.models.aspp import ASPP, DeepLabHead  # noqa: F401
from glfusion_tpu.models.tpavi import TPAVI  # noqa: F401
from glfusion_tpu.models.glfusion import (  # noqa: F401
    GlobalAndLocal,
    GlobalAndLocalCPS,
)
from glfusion_tpu.models.unet import (  # noqa: F401
    UNet,
    att_u_net,
    r2att_u_net,
    r2u_net,
    u_net,
)
from glfusion_tpu.models.multiview_unet import MultiviewUNet  # noqa: F401
