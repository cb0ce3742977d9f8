from viewfusion_tpu.models.unet import UNet  # noqa: F401
from viewfusion_tpu.models.view_fusion import ViewFusion  # noqa: F401
