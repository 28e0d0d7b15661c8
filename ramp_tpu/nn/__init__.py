from ramp_tpu.nn.layers import (
    TimeEncoder, SinusoidalPosEmb, Conv1dBlock, ResidualTemporalBlock,
    Downsample1d, Upsample1d, LinearAttention, group_norm_n_groups, mish,
)
from ramp_tpu.nn.attention import SpatialTransformer, CrossAttention, BasicTransformerBlock
from ramp_tpu.nn.encoders import ObstacleEncoderSet2D, ObstacleEncoder3D
from ramp_tpu.nn.unet import TemporalUnet, UNET_DIM_MULTS
