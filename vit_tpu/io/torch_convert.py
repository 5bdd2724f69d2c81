"""torchvision state-dict -> reference-layout tensors / params pytree.

The reference's Weight_{idx}_{name}.bin files are a torchvision ``vit_*``
state dict exported tensor-by-tensor (names match state-dict keys with dots
replaced by underscores — SURVEY.md §5).  This module closes the loop: given
an actual ``torchvision.models.vit_b_16().state_dict()`` (or a .pth file),
produce (a) the indexed tensor dict in the reference's exact layout — so
``save_reference_weights`` can emit bit-identical Weight_*.bin files — and
(b) the TPU params pytree directly.

Torch is used only for deserialization; everything becomes NumPy here.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from vit_tpu.config import VIT_B_16, ViTConfig
from vit_tpu.io import weights as wio


def _to_numpy(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x.astype(np.float32)
    # torch tensor (avoid importing torch unless given one); .float()
    # first: .numpy() rejects bfloat16 tensors
    return x.detach().cpu().float().numpy().astype(np.float32)


def state_dict_key(name: str) -> str:
    """Reference file name fragment -> torchvision state-dict key.

    e.g. ``encoder_layers_encoder_layer_3_mlp_0_weight``
      -> ``encoder.layers.encoder_layer_3.mlp.0.weight``
    """
    key = name
    key = key.replace("encoder_layers_encoder_layer_", "encoder.layers.encoder_layer_")
    key = key.replace("_ln_1_", ".ln_1.")
    key = key.replace("_ln_2_", ".ln_2.")
    key = key.replace("_self_attention_in_proj_", ".self_attention.in_proj_")
    key = key.replace("_self_attention_out_proj_", ".self_attention.out_proj.")
    key = key.replace("_mlp_0_", ".mlp.0.")
    key = key.replace("_mlp_3_", ".mlp.3.")
    key = key.replace("encoder_pos_embedding", "encoder.pos_embedding")
    key = key.replace("encoder_ln_weight", "encoder.ln.weight")
    key = key.replace("encoder_ln_bias", "encoder.ln.bias")
    key = key.replace("conv_proj_weight", "conv_proj.weight")
    key = key.replace("conv_proj_bias", "conv_proj.bias")
    key = key.replace("heads_head_weight", "heads.head.weight")
    key = key.replace("heads_head_bias", "heads.head.bias")
    return key


def tensors_from_state_dict(
    state_dict: Mapping[str, Any], cfg: ViTConfig = VIT_B_16
) -> Dict[int, np.ndarray]:
    """torchvision state dict -> {index: tensor} in the reference layout."""
    if cfg.distilled:
        raise ValueError(
            f"config {cfg.name} is DeiT-distilled; torchvision's vit_* state "
            "dicts have no distillation token — use the HF DeiT converter "
            "(io.hf_convert) or .npz/Orbax checkpoints"
        )
    out: Dict[int, np.ndarray] = {}
    for idx, name, shape in wio.reference_tensor_specs(cfg):
        key = state_dict_key(name)
        if key not in state_dict:
            raise KeyError(f"state dict missing {key!r} (for Weight_{idx}_{name})")
        t = _to_numpy(state_dict[key]).reshape(shape)
        out[idx] = t
    return out


def params_from_state_dict(
    state_dict: Mapping[str, Any],
    cfg: ViTConfig = VIT_B_16,
    round_to_6dp: bool = False,
    dtype=np.float32,
):
    """torchvision state dict -> TPU params pytree (optionally with the
    reference's 6-decimal rounding for pipeline parity)."""
    tensors = tensors_from_state_dict(state_dict, cfg)
    if round_to_6dp:
        tensors = {i: wio.round6(t) for i, t in tensors.items()}
    return wio.params_from_tensors(tensors, cfg, dtype)


def load_pth(path, cfg: ViTConfig = VIT_B_16, **kw):
    """Load a torchvision .pth checkpoint file -> params pytree."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return params_from_state_dict(sd, cfg, **kw)


def export_reference_bins(state_dict, out_dir, cfg: ViTConfig = VIT_B_16) -> None:
    """Emit Weight_{idx}_{name}.bin files identical to the reference's export
    of the same checkpoint."""
    wio.save_reference_weights(tensors_from_state_dict(state_dict, cfg), out_dir, cfg)


def state_dict_from_params(params, cfg: ViTConfig = VIT_B_16) -> Dict[str, np.ndarray]:
    """Inverse of params_from_state_dict: TPU params pytree -> torchvision
    state-dict arrays, with torchvision's native shapes (class_token
    (1,1,D), encoder.pos_embedding (1,T,D); everything else matches the
    reference tensor shapes, which ARE the state-dict shapes)."""
    tensors = wio.tensors_from_params(params, cfg)
    out: Dict[str, np.ndarray] = {}
    for idx, name, _shape in wio.reference_tensor_specs(cfg):
        arr = np.asarray(tensors[idx], np.float32)
        if name == "class_token":
            arr = arr.reshape(1, 1, -1)
        elif name == "encoder_pos_embedding":
            arr = arr.reshape(1, cfg.seq_len, cfg.embed_dim)
        out[state_dict_key(name)] = arr
    return out


def save_pth(params, path, cfg: ViTConfig = VIT_B_16) -> None:
    """Export a params pytree as a torchvision-loadable .pth state dict
    (torch.save of {key: tensor}) — the outbound half of the .pth interop
    (load_pth is the inbound half)."""
    import torch

    sd = {
        # copy: jax buffers surface as non-writable numpy views, which
        # torch.from_numpy warns about (undefined behavior on write)
        k: torch.from_numpy(np.array(v, dtype=np.float32, copy=True))
        for k, v in state_dict_from_params(params, cfg).items()
    }
    torch.save(sd, path)
