from ogc_tpu.data.base import DataLoader, PairFrameDataset
from ogc_tpu.data.sapien import SapienDataset
from ogc_tpu.data.ogcdr import OGCDynamicRoomDataset
from ogc_tpu.data.kittisf import KITTISceneFlowDataset
from ogc_tpu.data.kittidet import KITTIDetectionDataset
from ogc_tpu.data.semantickitti import SemanticKITTIDataset
from ogc_tpu.data.waymo import WaymoOpenDataset, WaymoOpenSingleFrameDataset
