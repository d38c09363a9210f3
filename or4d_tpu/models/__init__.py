"""Model zoo: the scene-graph stack (PointNet++ MSG encoders, TripletGCN,
classifier heads), the multimodal image branch, the Graphormer role model,
and the L1 perception models (VoxelPose-style, Group-Free-style)."""

from or4d_tpu.models.sgpn import SGPN, SGPNOutputs, sgpn_loss

__all__ = ["SGPN", "SGPNOutputs", "sgpn_loss"]
