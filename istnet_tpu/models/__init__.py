from istnet_tpu.models.ist_net import ISTNet, supervised_loss
from istnet_tpu.models.posenet_gt import PoseNetGT

__all__ = ["ISTNet", "PoseNetGT", "supervised_loss"]
