from ogc_tpu.models.segnet import MaskFormer3D
from ogc_tpu.models.flownet import FlowStep3D
