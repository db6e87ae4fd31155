from ogc_tpu.losses.seg_unsup import OGCLossConfig, ogc_loss
from ogc_tpu.losses.flow_unsup import FlowLossConfig, flowstep3d_loss
from ogc_tpu.losses.seg_sup import SupLossConfig, supervised_mask_loss
