"""Universal weight-source resolver for the CLIs.

The reference loads exactly one thing: a directory of ``Weight_*.bin``
(Network.c:119-194).  This framework produces and consumes more formats —
trained ``.npz`` checkpoints (``vit-tpu-train --save``), torchvision
``.pth`` state dicts, Orbax checkpoint directories — so every driver
accepts any of them through one entry point, dispatched on what the path
actually is:

  - directory containing ``Weight_*.bin``  -> reference loader
    (6-decimal rounding parity, synth fill for stripped blobs)
  - ``*.npz``                              -> io/checkpoint.load_npz
  - ``*.pth`` / ``*.pt``                   -> io/torch_convert.load_pth
  - other directory                        -> Orbax checkpoint
"""

from __future__ import annotations

from pathlib import Path

from vit_tpu.config import VIT_B_16, ViTConfig


def load_params_any(
    source,
    cfg: ViTConfig = VIT_B_16,
    round_to_6dp: bool = True,
    allow_synth: bool = False,
):
    """Resolve ``source`` (see module docstring) to a params pytree."""
    p = Path(source)
    if p.is_dir():
        if any(p.glob("Weight_*.bin")):
            from vit_tpu.io import weights as wio

            _check_native_checkpoint(cfg, source)
            return wio.load_reference_weights(
                p, cfg, round_to_6dp=round_to_6dp, allow_synth=allow_synth
            )
        from vit_tpu.io import checkpoint as ckpt

        return _no_mae(ckpt.load_orbax(p), source)
    suffix = p.suffix.lower()  # .NPZ/.PTH from case-insensitive filesystems
    if suffix == ".npz":
        from vit_tpu.io import checkpoint as ckpt

        if ckpt.is_train_state(p):
            # a --save-state archive: pull the params subtree instead of
            # unflattening 'params.*'/'opt.N'/'__step__' into a garbled
            # tree that dies later with KeyError('cls_token')
            return _no_mae(ckpt.load_params_from_state(p), source)
        return _no_mae(ckpt.load_npz(p), source)
    if suffix in (".pth", ".pt"):
        from vit_tpu.io.torch_convert import load_pth

        _check_native_checkpoint(cfg, source)
        return load_pth(p, cfg)
    raise ValueError(
        f"unrecognized weight source {source!r}: expected a Weight_*.bin "
        "directory, an Orbax checkpoint directory, a .npz, or a .pth/.pt"
    )


def _check_native_checkpoint(cfg, source):
    """Published-family loaders (Weight_*.bin, torchvision .pth) pack QKV
    columns per cfg.num_heads; a config with no published checkpoints
    (vit_b_16_wide: 6x128 heads in B/16 tensor shapes) would load one
    without any shape error and silently compute wrong attention."""
    if not cfg.native_checkpoints:
        raise ValueError(
            f"{source} is a published-family checkpoint, but config "
            f"{cfg.name} has a head geometry ({cfg.num_heads}x"
            f"{cfg.head_dim}) no published checkpoint shares — its packed-"
            "QKV column grouping would be misinterpreted.  Train this "
            "config from scratch (or from an MAE backbone) and load the "
            "resulting .npz/Orbax checkpoint instead"
        )


def _no_mae(tree, source):
    """MAE pretraining trees (decoder, no classifier head) can't serve as
    classifier weights — fail at load with the conversion recipe instead
    of a KeyError('head') minutes later inside a jit."""
    from vit_tpu.models.mae import is_mae_params

    if is_mae_params(tree):
        raise ValueError(
            f"{source} is an MAE pretraining checkpoint (decoder present, "
            "no classifier head): extract the fine-tuning backbone first — "
            "vit-tpu-train --mae --save-backbone PATH, then use PATH here"
        )
    return tree
