from ogc_tpu.refine.oa_icp import object_aware_icp, weighted_kabsch
from ogc_tpu.refine.vote import mask_voting
