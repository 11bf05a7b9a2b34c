"""Data pipeline: NIfTI IO, dataset index, clip/frame sampling, batching.

Host side stays thin (decode + frame select + nearest resize to the static
144² grid); everything after that — crop, normalize, 5-class mask remap,
view stacking — is one fused jit on device.
"""

from glfusion_tpu.data.nifti import read_nifti, write_nifti  # noqa: F401
from glfusion_tpu.data.infos import PatientIndex, load_infos  # noqa: F401
from glfusion_tpu.data.xlsx import load_center_manifest, load_manifest_dir  # noqa: F401
from glfusion_tpu.data.synthetic import generate_synthetic_dataset  # noqa: F401
from glfusion_tpu.data.pipeline import (  # noqa: F401
    AlignedClipLoader,
    AllMaskFrameLoader,
    FullVideoLoader,
    RegressionClipLoader,
    SegFrameLoader,
    TestClipLoader,
    preprocess_batch,
    preprocess_regression_batch,
)
