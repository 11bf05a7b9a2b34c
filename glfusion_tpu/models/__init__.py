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
from glfusion_tpu.models.utnet import UTNet  # noqa: F401
from glfusion_tpu.models.cen import CENRefineNet  # noqa: F401
from glfusion_tpu.models.res3dunet import ResUNet3D  # noqa: F401
from glfusion_tpu.models.resnet3d import Resnet50PAH, ResNet3D  # noqa: F401
from glfusion_tpu.models.mriresnet3d import (  # noqa: F401
    MRIResNet3D,
    Resnet50PFS,
)
from glfusion_tpu.models.r2plus1d import (  # noqa: F401
    R2Plus1D18,
    r2plus1d_18,
    r2plus1d_18_iekd,
)
from glfusion_tpu.models.timesformer import TimeSformer  # noqa: F401
from glfusion_tpu.models.avs import (  # noqa: F401
    AVSBaseline,
    AVSTransfusion,
    B2ResNet,
    PredEndecoder,
)
from glfusion_tpu.models.legacy_variants import (  # noqa: F401
    LegacyMultiviewSeg,
    SpatialConcatFusion,
    SpatialMLP,
)
