"""Import reference PyTorch checkpoints into RAMP-TPU flax parameter trees.

The reference (`/root/reference`) trains `TemporalUnetInference`/`UnetTrain`
models and saves torch `state_dict`s (`mpd/trainerddp/trainer.py:34-53`).
RAMP-TPU's `TemporalUnet` (`ramp_tpu/nn/unet.py`) and `ObstacleEncoderSet2D`
(`ramp_tpu/nn/encoders.py`) are architecture-parity rebuilds, so a trained
reference checkpoint maps 1:1 onto our parameter trees — this module performs
that mapping so reference users can bring their GPU-trained weights to TPU
without retraining.

Conventions converted (torch -> flax):
  * ``nn.Linear``           weight [out, in]     -> Dense kernel [in, out]
  * ``nn.Conv1d``           weight [out, in, k]  -> Conv kernel [k, in, out]
  * ``nn.ConvTranspose1d``  weight [in, out, k]  -> ConvTranspose(transpose_
    kernel=True) kernel [k, out, in]
  * 1x1 ``nn.Conv1d`` used as a channel projection (SpatialTransformer
    proj_in/proj_out `layers_attention_mini.py:176,190`, final_conv.1
    `UnetInference.py:154`) -> Dense kernel [in, out]
  * Group/LayerNorm weight/bias -> scale/bias

Numerics note: our GELUs use ``approximate=False`` (exact erf) to match
``torch.nn.GELU``'s default; `tests/test_torch_import.py` verifies converted
weights reproduce the reference forward to float32 tolerance.

The module imports torch lazily and only for ``load_reference_checkpoint``;
the converters themselves take plain ``{name: np.ndarray}`` dicts.
"""
from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np

Array = np.ndarray
SD = Mapping[str, Array]


def _np(sd: SD, key: str) -> Array:
    if key not in sd:
        raise KeyError(f"reference state_dict is missing {key!r}")
    v = sd[key]
    return np.asarray(v, dtype=np.float32)


def _linear(sd: SD, prefix: str, bias: bool = True) -> Dict[str, Array]:
    out = {"kernel": _np(sd, f"{prefix}.weight").T}
    if bias:
        out["bias"] = _np(sd, f"{prefix}.bias")
    return out


def _conv1d(sd: SD, prefix: str) -> Dict[str, Array]:
    return {"kernel": _np(sd, f"{prefix}.weight").transpose(2, 1, 0),
            "bias": _np(sd, f"{prefix}.bias")}


def _conv_transpose1d(sd: SD, prefix: str) -> Dict[str, Array]:
    # torch [in, out, k] -> flax transpose_kernel=True [k, out, in]
    return {"kernel": _np(sd, f"{prefix}.weight").transpose(2, 1, 0),
            "bias": _np(sd, f"{prefix}.bias")}


def _conv1x1_as_dense(sd: SD, prefix: str) -> Dict[str, Array]:
    w = _np(sd, f"{prefix}.weight")  # [out, in, 1]
    return {"kernel": w[:, :, 0].T, "bias": _np(sd, f"{prefix}.bias")}


def _norm(sd: SD, prefix: str) -> Dict[str, Array]:
    return {"scale": _np(sd, f"{prefix}.weight"),
            "bias": _np(sd, f"{prefix}.bias")}


def _residual_temporal_block(sd: SD, p: str) -> Dict[str, Dict]:
    out = {
        "Conv1dBlock_0": {"Conv_0": _conv1d(sd, f"{p}.blocks.0.block.0"),
                          "GroupNorm_0": _norm(sd, f"{p}.blocks.0.block.2")},
        "Dense_0": _linear(sd, f"{p}.cond_mlp.1"),
        "Conv1dBlock_1": {"Conv_0": _conv1d(sd, f"{p}.blocks.1.block.0"),
                          "GroupNorm_0": _norm(sd, f"{p}.blocks.1.block.2")},
    }
    if f"{p}.residual_conv.weight" in sd:  # Identity when channels match
        out["Conv_0"] = _conv1d(sd, f"{p}.residual_conv")
    return out


def _cross_attention(sd: SD, p: str) -> Dict[str, Dict]:
    return {
        "to_q": _linear(sd, f"{p}.to_q", bias=False),
        "to_k": _linear(sd, f"{p}.to_k", bias=False),
        "to_v": _linear(sd, f"{p}.to_v", bias=False),
        "to_out": _linear(sd, f"{p}.to_out.0"),
    }


def _spatial_transformer(sd: SD, p: str, depth: int = 2) -> Dict[str, Dict]:
    out = {
        "GroupNorm_0": _norm(sd, f"{p}.norm"),
        "proj_in": _conv1x1_as_dense(sd, f"{p}.proj_in"),
        "proj_out": _conv1x1_as_dense(sd, f"{p}.proj_out"),
    }
    for d in range(depth):
        b = f"{p}.transformer_blocks.{d}"
        out[f"block_{d}"] = {
            "LayerNorm_0": _norm(sd, f"{b}.norm1"),
            "CrossAttention_0": _cross_attention(sd, f"{b}.attn1"),
            "LayerNorm_1": _norm(sd, f"{b}.norm2"),
            "CrossAttention_1": _cross_attention(sd, f"{b}.attn2"),
            "LayerNorm_2": _norm(sd, f"{b}.norm3"),
            "FeedForward_0": {
                "GEGLU_0": {"Dense_0": _linear(sd, f"{b}.ff.net.0.proj")},
                "Dense_0": _linear(sd, f"{b}.ff.net.2"),
            },
        }
    return out


def convert_unet_state_dict(sd: SD, n_resolutions: int,
                            depth_attn: int = 2) -> Dict:
    """torch `TemporalUnet{Inference,Train}` state_dict -> flax variables
    ``{"params": ...}`` for `ramp_tpu.nn.unet.TemporalUnet`.

    ``n_resolutions`` = len(dim_mults) (3 for UNET_DIM_MULTS[0], 4 for [1]).
    Scene-encoder keys (``scene_encoder.*``) are ignored — convert them with
    `convert_encoder2d_state_dict`.
    """
    params: Dict[str, Dict] = {
        "TimeEncoder_0": {"Dense_0": _linear(sd, "time_mlp.encoder.1"),
                          "Dense_1": _linear(sd, "time_mlp.encoder.3")},
        "final_block": {"Conv_0": _conv1d(sd, "final_conv.0.block.0"),
                        "GroupNorm_0": _norm(sd, "final_conv.0.block.2")},
        "final_proj": _conv1x1_as_dense(sd, "final_conv.1"),
        "mid_res0": _residual_temporal_block(sd, "mid_block1"),
        "mid_attn": _spatial_transformer(sd, "mid_attention", depth_attn),
        "mid_res1": _residual_temporal_block(sd, "mid_block2"),
    }
    for i in range(n_resolutions):
        params[f"down{i}_res0"] = _residual_temporal_block(sd, f"downs.{i}.0")
        params[f"down{i}_res1"] = _residual_temporal_block(sd, f"downs.{i}.1")
        params[f"down{i}_attn"] = _spatial_transformer(sd, f"downs.{i}.3",
                                                       depth_attn)
        if f"downs.{i}.4.conv.weight" in sd:  # Identity on the last level
            params[f"down{i}_downsample"] = {
                "Conv_0": _conv1d(sd, f"downs.{i}.4.conv")}
    for i in range(n_resolutions - 1):
        params[f"up{i}_res0"] = _residual_temporal_block(sd, f"ups.{i}.0")
        params[f"up{i}_res1"] = _residual_temporal_block(sd, f"ups.{i}.1")
        params[f"up{i}_attn"] = _spatial_transformer(sd, f"ups.{i}.3",
                                                     depth_attn)
        params[f"up{i}_upsample"] = {
            "ConvTranspose_0": _conv_transpose1d(sd, f"ups.{i}.4.conv")}
    return {"params": params}


def _set_transformer_block2d(sd: SD, p: str) -> Dict[str, Dict]:
    return {
        "LayerNorm_0": _norm(sd, f"{p}.norm1"),
        "MultiheadSelfAttention_0": {
            "Dense_0": _linear(sd, f"{p}.attn.qkv", bias=False),
            "Dense_1": _linear(sd, f"{p}.attn.proj"),
        },
        "LayerNorm_1": _norm(sd, f"{p}.norm2"),
        "Dense_0": _linear(sd, f"{p}.mlp.0"),
        "Dense_1": _linear(sd, f"{p}.mlp.3"),
    }


def convert_encoder2d_state_dict(sd: SD,
                                 output_dims=(64, 96, 160),
                                 num_blocks: int = 3) -> Dict:
    """torch `ObstacleEncoderSet` state_dict -> flax variables for
    `ObstacleEncoderSet2D`. Accepts keys with or without a leading
    ``scene_encoder.`` prefix."""
    if any(k.startswith("scene_encoder.") for k in sd):
        sd = {k[len("scene_encoder."):]: v for k, v in sd.items()
              if k.startswith("scene_encoder.")}
    params: Dict[str, Dict] = {
        "Dense_0": _linear(sd, "point_embedding.0"),
        "LayerNorm_0": _norm(sd, "point_embedding.1"),
        "Dense_1": _linear(sd, "combined_encoder.0"),
        "LayerNorm_1": _norm(sd, "combined_encoder.1"),
    }
    for s, dim in enumerate(output_dims):
        for b in range(num_blocks):
            params[f"stack{dim}_block{b}"] = _set_transformer_block2d(
                sd, f"set_transformers.{s}.{b}")
        params[f"pool{dim}_0"] = _linear(sd, f"poolings.{s}.0")
        params[f"pool{dim}_1"] = _linear(sd, f"poolings.{s}.2")
    return {"params": params}


def split_reference_state_dict(sd: SD) -> Tuple[Dict[str, Array], Dict[str, Array]]:
    """Split a reference *diffusion-model* state_dict (keys ``model.*`` from
    `StaticGaussianDiffusionModel`, e.g. an ``ema_model_current_state_dict``)
    into (unet_sd, encoder_sd), dropping the registered schedule buffers
    (betas/alphas_cumprod/... `diffusion_model_static.py:62-84`) which
    RAMP-TPU recomputes from the config."""
    unet, enc = {}, {}
    for k, v in sd.items():
        if k.startswith("model."):
            k = k[len("model."):]
        if k.startswith("scene_encoder."):
            enc[k[len("scene_encoder."):]] = v
        elif "." in k:  # buffers like "betas" have no module path
            unet[k] = v
    return unet, enc


def _inv_linear(params: Mapping, prefix: str, out: Dict[str, Array],
                bias: bool = True) -> None:
    out[f"{prefix}.weight"] = np.asarray(params["kernel"]).T
    if bias:
        out[f"{prefix}.bias"] = np.asarray(params["bias"])


def _inv_conv1d(params: Mapping, prefix: str, out: Dict[str, Array]) -> None:
    out[f"{prefix}.weight"] = np.asarray(params["kernel"]).transpose(2, 1, 0)
    out[f"{prefix}.bias"] = np.asarray(params["bias"])


def _inv_conv1x1(params: Mapping, prefix: str, out: Dict[str, Array]) -> None:
    out[f"{prefix}.weight"] = np.asarray(params["kernel"]).T[:, :, None]
    out[f"{prefix}.bias"] = np.asarray(params["bias"])


def _inv_norm(params: Mapping, prefix: str, out: Dict[str, Array]) -> None:
    out[f"{prefix}.weight"] = np.asarray(params["scale"])
    out[f"{prefix}.bias"] = np.asarray(params["bias"])


def _inv_rtb(params: Mapping, p: str, out: Dict[str, Array]) -> None:
    _inv_conv1d(params["Conv1dBlock_0"]["Conv_0"], f"{p}.blocks.0.block.0", out)
    _inv_norm(params["Conv1dBlock_0"]["GroupNorm_0"], f"{p}.blocks.0.block.2", out)
    _inv_conv1d(params["Conv1dBlock_1"]["Conv_0"], f"{p}.blocks.1.block.0", out)
    _inv_norm(params["Conv1dBlock_1"]["GroupNorm_0"], f"{p}.blocks.1.block.2", out)
    _inv_linear(params["Dense_0"], f"{p}.cond_mlp.1", out)
    if "Conv_0" in params:
        _inv_conv1d(params["Conv_0"], f"{p}.residual_conv", out)


def _inv_spatial_transformer(params: Mapping, p: str, out: Dict[str, Array],
                             depth: int = 2) -> None:
    _inv_norm(params["GroupNorm_0"], f"{p}.norm", out)
    _inv_conv1x1(params["proj_in"], f"{p}.proj_in", out)
    _inv_conv1x1(params["proj_out"], f"{p}.proj_out", out)
    for d in range(depth):
        blk, b = params[f"block_{d}"], f"{p}.transformer_blocks.{d}"
        _inv_norm(blk["LayerNorm_0"], f"{b}.norm1", out)
        _inv_norm(blk["LayerNorm_1"], f"{b}.norm2", out)
        _inv_norm(blk["LayerNorm_2"], f"{b}.norm3", out)
        for attn, name in ((blk["CrossAttention_0"], "attn1"),
                           (blk["CrossAttention_1"], "attn2")):
            _inv_linear(attn["to_q"], f"{b}.{name}.to_q", out, bias=False)
            _inv_linear(attn["to_k"], f"{b}.{name}.to_k", out, bias=False)
            _inv_linear(attn["to_v"], f"{b}.{name}.to_v", out, bias=False)
            _inv_linear(attn["to_out"], f"{b}.{name}.to_out.0", out)
        ff = blk["FeedForward_0"]
        _inv_linear(ff["GEGLU_0"]["Dense_0"], f"{b}.ff.net.0.proj", out)
        _inv_linear(ff["Dense_0"], f"{b}.ff.net.2", out)


def export_unet_state_dict(variables: Mapping, n_resolutions: int,
                           depth_attn: int = 2) -> Dict[str, Array]:
    """Inverse of `convert_unet_state_dict`: flax variables -> torch-layout
    state_dict (numpy values) loadable by the reference's
    `TemporalUnetInference.load_state_dict` (strict=False for the scene
    encoder, or merge with `export_encoder2d_state_dict`)."""
    params = variables["params"] if "params" in variables else variables
    out: Dict[str, Array] = {}
    _inv_linear(params["TimeEncoder_0"]["Dense_0"], "time_mlp.encoder.1", out)
    _inv_linear(params["TimeEncoder_0"]["Dense_1"], "time_mlp.encoder.3", out)
    _inv_rtb(params["mid_res0"], "mid_block1", out)
    _inv_spatial_transformer(params["mid_attn"], "mid_attention", out, depth_attn)
    _inv_rtb(params["mid_res1"], "mid_block2", out)
    for i in range(n_resolutions):
        _inv_rtb(params[f"down{i}_res0"], f"downs.{i}.0", out)
        _inv_rtb(params[f"down{i}_res1"], f"downs.{i}.1", out)
        _inv_spatial_transformer(params[f"down{i}_attn"], f"downs.{i}.3",
                                 out, depth_attn)
        if f"down{i}_downsample" in params:
            _inv_conv1d(params[f"down{i}_downsample"]["Conv_0"],
                        f"downs.{i}.4.conv", out)
    for i in range(n_resolutions - 1):
        _inv_rtb(params[f"up{i}_res0"], f"ups.{i}.0", out)
        _inv_rtb(params[f"up{i}_res1"], f"ups.{i}.1", out)
        _inv_spatial_transformer(params[f"up{i}_attn"], f"ups.{i}.3",
                                 out, depth_attn)
        # torch ConvTranspose1d [in, out, k] <- flax [k, out, in]
        w = np.asarray(params[f"up{i}_upsample"]["ConvTranspose_0"]["kernel"])
        out[f"ups.{i}.4.conv.weight"] = w.transpose(2, 1, 0)
        out[f"ups.{i}.4.conv.bias"] = np.asarray(
            params[f"up{i}_upsample"]["ConvTranspose_0"]["bias"])
    _inv_conv1d(params["final_block"]["Conv_0"], "final_conv.0.block.0", out)
    _inv_norm(params["final_block"]["GroupNorm_0"], "final_conv.0.block.2", out)
    _inv_conv1x1(params["final_proj"], "final_conv.1", out)
    return out


def export_encoder2d_state_dict(variables: Mapping,
                                output_dims=(64, 96, 160),
                                num_blocks: int = 3) -> Dict[str, Array]:
    """Inverse of `convert_encoder2d_state_dict` (keys WITHOUT the
    ``scene_encoder.`` prefix)."""
    params = variables["params"] if "params" in variables else variables
    out: Dict[str, Array] = {}
    _inv_linear(params["Dense_0"], "point_embedding.0", out)
    _inv_norm(params["LayerNorm_0"], "point_embedding.1", out)
    _inv_linear(params["Dense_1"], "combined_encoder.0", out)
    _inv_norm(params["LayerNorm_1"], "combined_encoder.1", out)
    for s, dim in enumerate(output_dims):
        for b in range(num_blocks):
            blk, p = params[f"stack{dim}_block{b}"], f"set_transformers.{s}.{b}"
            _inv_norm(blk["LayerNorm_0"], f"{p}.norm1", out)
            _inv_norm(blk["LayerNorm_1"], f"{p}.norm2", out)
            _inv_linear(blk["MultiheadSelfAttention_0"]["Dense_0"],
                        f"{p}.attn.qkv", out, bias=False)
            _inv_linear(blk["MultiheadSelfAttention_0"]["Dense_1"],
                        f"{p}.attn.proj", out)
            _inv_linear(blk["Dense_0"], f"{p}.mlp.0", out)
            _inv_linear(blk["Dense_1"], f"{p}.mlp.3", out)
        _inv_linear(params[f"pool{dim}_0"], f"poolings.{s}.0", out)
        _inv_linear(params[f"pool{dim}_1"], f"poolings.{s}.2", out)
    return out


def import_reference_checkpoint(path: str, n_resolutions: int) -> Dict[str, Dict]:
    """Load a reference ``*.pth`` checkpoint and return
    ``{"unet": variables, "encoder": variables}`` ready for
    `StaticPlanner`/`DynamicPlanner` ``params``."""
    import torch  # local import: torch is ingest-only in this framework
    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]  # DDP trainer full dict (trainerddp/trainer.py:34-45)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    unet_sd, enc_sd = split_reference_state_dict(sd)
    return {"unet": convert_unet_state_dict(unet_sd, n_resolutions),
            "encoder": convert_encoder2d_state_dict(enc_sd)}
