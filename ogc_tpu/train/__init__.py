from ogc_tpu.train.seg import SegTrainer, make_lr_schedule, make_optimizer
from ogc_tpu.train.flow import FlowTrainer, make_bn_schedule
from ogc_tpu.train.seg_sup import SupSegTrainer
