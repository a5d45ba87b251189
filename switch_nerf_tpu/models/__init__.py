from switch_nerf_tpu.models.mlp import Mlp, NormMlp
from switch_nerf_tpu.models.experts import ExpertMLP
from switch_nerf_tpu.models.moe import MoELayer
from switch_nerf_tpu.models.nerf import NeRF
from switch_nerf_tpu.models.nerf_moe import NeRFMoE, MipNeRFMoE
