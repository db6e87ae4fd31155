from ogc_tpu.nn.layers import MLP, PointwiseConv, SharedMLP, set_compute_dtype
from ogc_tpu.nn.pointnet2 import FPModule, SAModule, SAModuleMSG
from ogc_tpu.nn.flowstep3d import (
    FlowEmbedding,
    FlowFPModule,
    FlowSAModule,
    InstanceNorm,
    SchedulableBatchNorm,
)
from ogc_tpu.nn.transformer import MaskFormerHead, TransformerDecoderLayer
