"""Weight loader for the reference's ``Weight_{idx}_{name}.bin`` format.

Replaces `load_weights` (Network.c:99-194): the reference scans a directory
for ``Weight_*.bin`` files, parses the index out of the filename
(Network.c:133-160), reads each whole file as little-endian fp32, and —
its signature quirk — rounds every value to 6 decimal places
(``roundf(x*1e6)/1e6``, Network.c:184-187).  We reproduce all of that
(rounding behind a parity switch), then repack the 152 torchvision-layout
tensors into the TPU-friendly params pytree of vit_tpu.models.vit:
[out, in] matrices are transposed to [in, out], the 12 encoder layers are
stacked on a leading axis, and the packed in_proj keeps its Q/K/V row-block
order (offsets 0/D/2D, ViT_seq.c:137-141).

Index layout (verified in SURVEY.md §5): 0=class_token[768],
1=conv_proj_weight[768,3,16,16], 2=conv_proj_bias[768],
3=pos_embedding[197,768]; per layer l, base=4+12l:
{ln_1_w, ln_1_b, in_proj_w[2304,768], in_proj_b[2304], out_proj_w[768,768],
 out_proj_b[768], ln_2_w, ln_2_b, mlp_0_w[3072,768], mlp_0_b[3072],
 mlp_3_w[768,3072], mlp_3_b[768]}; 148/149=final LN; 150=head_w[1000,768],
151=head_b[1000].

The repo snapshot strips the 37 largest blobs (.MISSING_LARGE_BLOBS), so the
loader can synthesize any missing tensor from a seeded RNG
(``allow_synth=True``) — tests and benchmarks stay runnable without the
artifacts (SURVEY.md §4 implication).
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np

from vit_tpu.config import VIT_B_16, ViTConfig

WEIGHTS_PER_LAYER = 12

_FILE_RE = re.compile(r"^Weight_(\d+)_(.+)\.bin$")


def reference_tensor_specs(cfg: ViTConfig = VIT_B_16) -> List[Tuple[int, str, Tuple[int, ...]]]:
    """(index, torchvision name, shape) for every tensor in the reference
    checkpoint layout, generalized over config."""
    d, f, t, c, ps = cfg.embed_dim, cfg.mlp_dim, cfg.seq_len, cfg.num_classes, cfg.patch_size
    specs: List[Tuple[int, str, Tuple[int, ...]]] = [
        (0, "class_token", (d,)),
        (1, "conv_proj_weight", (d, cfg.in_channels, ps, ps)),
        (2, "conv_proj_bias", (d,)),
        (3, "encoder_pos_embedding", (t, d)),
    ]
    per_layer = [
        ("ln_1_weight", (d,)),
        ("ln_1_bias", (d,)),
        ("self_attention_in_proj_weight", (3 * d, d)),
        ("self_attention_in_proj_bias", (3 * d,)),
        ("self_attention_out_proj_weight", (d, d)),
        ("self_attention_out_proj_bias", (d,)),
        ("ln_2_weight", (d,)),
        ("ln_2_bias", (d,)),
        ("mlp_0_weight", (f, d)),
        ("mlp_0_bias", (f,)),
        ("mlp_3_weight", (d, f)),
        ("mlp_3_bias", (d,)),
    ]
    for l in range(cfg.depth):
        base = 4 + WEIGHTS_PER_LAYER * l
        for j, (name, shape) in enumerate(per_layer):
            specs.append((base + j, f"encoder_layers_encoder_layer_{l}_{name}", shape))
    base = 4 + WEIGHTS_PER_LAYER * cfg.depth
    specs += [
        (base + 0, "encoder_ln_weight", (d,)),
        (base + 1, "encoder_ln_bias", (d,)),
        (base + 2, "heads_head_weight", (c, d)),
        (base + 3, "heads_head_bias", (c,)),
    ]
    return specs


def round6(x: np.ndarray) -> np.ndarray:
    """The reference's 6-decimal load-time rounding (Network.c:186):
    ``roundf(v * 1e6f) / 1e6f`` in fp32.

    C's roundf rounds halves AWAY FROM ZERO (np.round rounds half-to-even),
    so the tie-break is emulated exactly: scale in fp32 like the C code,
    round in float64 (where |y|+0.5 and floor are exact for all fp32 y),
    then divide back in fp32.
    """
    x = np.asarray(x, dtype=np.float32)
    y = (x * np.float32(1e6)).astype(np.float64)
    r = np.copysign(np.floor(np.abs(y) + 0.5), y)
    return (r.astype(np.float32) / np.float32(1e6)).astype(np.float32)


def scan_weight_dir(weight_dir: Path) -> Dict[int, Path]:
    """Directory scan, index parsed from the filename (Network.c:133-160).
    Replaces the reference's dirent shim (dirent.c) with portable pathlib."""
    found: Dict[int, Path] = {}
    for path in Path(weight_dir).iterdir():
        m = _FILE_RE.match(path.name)
        if m:
            found[int(m.group(1))] = path
    return found


def synth_reference_tensors(
    cfg: ViTConfig = VIT_B_16, seed: int = 0
) -> Dict[int, np.ndarray]:
    """Seeded random tensors in the reference's exact torchvision layout —
    stand-ins for the stripped blobs; scales chosen to keep a 12-layer
    forward numerically tame."""
    rng = np.random.default_rng(seed)
    out: Dict[int, np.ndarray] = {}
    for idx, name, shape in reference_tensor_specs(cfg):
        fan_in = shape[-1] if len(shape) > 1 else shape[0]
        if len(shape) == 4:
            fan_in = int(np.prod(shape[1:]))
        if name.endswith(("ln_1_weight", "ln_2_weight", "ln_weight")):
            t = np.ones(shape, np.float32)
        elif name.endswith("bias") or name == "class_token":
            t = np.zeros(shape, np.float32)
        elif name == "encoder_pos_embedding":
            t = rng.normal(0, 0.02, shape).astype(np.float32)
        else:
            t = rng.normal(0, (1.0 / fan_in) ** 0.5, shape).astype(np.float32)
        out[idx] = t
    return out


def load_reference_tensors(
    weight_dir: Path,
    cfg: ViTConfig = VIT_B_16,
    round_to_6dp: bool = True,
    allow_synth: bool = False,
    synth_seed: int = 0,
    use_native: bool = True,
) -> Dict[int, np.ndarray]:
    """Read every Weight_*.bin into its torchvision shape.

    ``round_to_6dp`` reproduces Network.c:186 (on by default for bit-parity
    with the reference pipeline).  Missing files raise unless
    ``allow_synth``, in which case seeded random tensors fill the gaps.
    """
    specs = reference_tensor_specs(cfg)
    files = scan_weight_dir(weight_dir)
    synth = None
    reader = None
    if use_native:
        from vit_tpu.io import native

        reader = native.read_fp32 if native.available() else None
    out: Dict[int, np.ndarray] = {}
    for idx, name, shape in specs:
        path = files.get(idx)
        if path is None:
            if not allow_synth:
                raise FileNotFoundError(
                    f"missing Weight_{idx}_{name}.bin in {weight_dir}"
                )
            if synth is None:
                synth = synth_reference_tensors(cfg, synth_seed)
            out[idx] = round6(synth[idx]) if round_to_6dp else synth[idx]
            continue
        if reader is not None:
            flat = reader(path, round_to_6dp)
        else:
            flat = np.fromfile(path, dtype="<f4")
            if round_to_6dp:
                flat = round6(flat)
        expected = int(np.prod(shape))
        if flat.size != expected:
            raise ValueError(
                f"{path.name}: got {flat.size} fp32 values, expected {expected} {shape}"
            )
        out[idx] = flat.reshape(shape)
    return out


def params_from_tensors(
    tensors: Dict[int, np.ndarray], cfg: ViTConfig = VIT_B_16, dtype=np.float32
):
    """Repack indexed torchvision tensors -> vit_tpu.models.vit params pytree.

    Transposes every [out, in] matrix to [in, out] (so the hot path is x @ W
    on the MXU), flattens conv_proj_weight [D,C,p,p] to (C*p*p, D) in the
    channel-major patch order the model's patch_embed uses, and stacks the
    encoder layers on a leading axis.

    The packed in_proj columns are *reordered* from torchvision's
    (3, heads, head_dim) blocks (Q/K/V at offsets 0/D/2D, ViT_seq.c:137-141)
    to (heads, 3, head_dim): a contiguous tensor-parallel shard of the 3D
    output axis is then a clean group of whole heads, each with its own
    Q/K/V — Megatron-style column-parallel QKV with zero resharding.
    """
    d = cfg.embed_dim
    L = cfg.depth
    hd = cfg.head_dim
    nh = cfg.num_heads
    base_final = 4 + WEIGHTS_PER_LAYER * L

    def t(i):
        return np.asarray(tensors[i], dtype=np.float32)

    def qkv_reorder(w):
        """[3D, ...] rows (3, H, Dh)-major -> (H, 3, Dh)-major."""
        return w.reshape(3, nh, hd, *w.shape[1:]).transpose(
            1, 0, *range(2, w.ndim + 2)
        ).reshape(w.shape)

    def stack(offset):
        return np.stack([t(4 + WEIGHTS_PER_LAYER * l + offset) for l in range(L)])

    def stack_qkv(offset):
        return np.stack(
            [qkv_reorder(t(4 + WEIGHTS_PER_LAYER * l + offset)) for l in range(L)]
        )

    def stack_qkv_t(offset):
        return np.stack(
            [qkv_reorder(t(4 + WEIGHTS_PER_LAYER * l + offset)).T for l in range(L)]
        )

    def stack_t(offset):
        return np.stack(
            [t(4 + WEIGHTS_PER_LAYER * l + offset).T for l in range(L)]
        )

    params = {
        "cls_token": t(0).reshape(d),
        "patch_embed": {
            "kernel": t(1).reshape(d, cfg.patch_dim).T.copy(),
            "bias": t(2),
        },
        "pos_embed": t(3).reshape(cfg.seq_len, d),
        "blocks": {
            "ln1_scale": stack(0),
            "ln1_bias": stack(1),
            "wqkv": stack_qkv_t(2),
            "bqkv": stack_qkv(3),
            "wo": stack_t(4),
            "bo": stack(5),
            "ln2_scale": stack(6),
            "ln2_bias": stack(7),
            "w1": stack_t(8),
            "b1": stack(9),
            "w2": stack_t(10),
            "b2": stack(11),
        },
        "ln_final": {"scale": t(base_final), "bias": t(base_final + 1)},
        "head": {"kernel": t(base_final + 2).T.copy(), "bias": t(base_final + 3)},
    }
    if dtype is not np.float32:
        from vit_tpu.utils import cast_tree

        params = cast_tree(params, dtype)
    return params


def load_reference_weights(
    weight_dir,
    cfg: ViTConfig = VIT_B_16,
    round_to_6dp: bool = True,
    allow_synth: bool = False,
    synth_seed: int = 0,
    dtype=np.float32,
):
    """One-call path: directory -> params pytree (Network.c load_weights
    equivalent, plus repacking)."""
    if cfg.distilled:
        raise ValueError(
            f"config {cfg.name} is DeiT-distilled; the reference "
            "Weight_*.bin layout (152 torchvision-ViT tensors, SURVEY.md §5) "
            "has no distillation token — load from .npz/Orbax/.pth/HF instead"
        )
    tensors = load_reference_tensors(
        Path(weight_dir), cfg, round_to_6dp, allow_synth, synth_seed
    )
    return params_from_tensors(tensors, cfg, dtype)


def tensors_from_params(params, cfg: ViTConfig = VIT_B_16) -> Dict[int, np.ndarray]:
    """Inverse of params_from_tensors: TPU params pytree -> indexed
    torchvision-layout tensors (un-transpose, un-reorder the packed QKV
    columns back to (3, heads, head_dim) row blocks, unstack layers).
    Round-trips bit-exactly; lets any params pytree (trained, converted)
    be exported as reference Weight_*.bin files."""
    if "dist_token" in params:
        raise ValueError(
            "DeiT-distilled params (dist_token/head_dist) cannot round-trip "
            "the torchvision-ViT 152-tensor layout (reference Weight_*.bin "
            "and .pth exports) — it has no distillation token; export to "
            ".npz/Orbax instead"
        )
    d, hd, nh, L = cfg.embed_dim, cfg.head_dim, cfg.num_heads, cfg.depth
    blocks = params["blocks"]

    def np32(a):
        return np.asarray(a, dtype=np.float32)

    def qkv_unorder(w):
        """rows (head, {q,k,v}, dh)-major -> torchvision (3, H, dh)-major."""
        return (
            w.reshape(nh, 3, hd, *w.shape[1:])
            .transpose(1, 0, *range(2, w.ndim + 2))
            .reshape(w.shape)
        )

    out: Dict[int, np.ndarray] = {
        0: np32(params["cls_token"]),
        1: np32(params["patch_embed"]["kernel"]).T.reshape(
            d, cfg.in_channels, cfg.patch_size, cfg.patch_size
        ),
        2: np32(params["patch_embed"]["bias"]),
        3: np32(params["pos_embed"]),
    }
    for l in range(L):
        base = 4 + WEIGHTS_PER_LAYER * l
        out[base + 0] = np32(blocks["ln1_scale"][l])
        out[base + 1] = np32(blocks["ln1_bias"][l])
        out[base + 2] = qkv_unorder(np32(blocks["wqkv"][l]).T.copy())
        out[base + 3] = qkv_unorder(np32(blocks["bqkv"][l]))
        out[base + 4] = np32(blocks["wo"][l]).T.copy()
        out[base + 5] = np32(blocks["bo"][l])
        out[base + 6] = np32(blocks["ln2_scale"][l])
        out[base + 7] = np32(blocks["ln2_bias"][l])
        out[base + 8] = np32(blocks["w1"][l]).T.copy()
        out[base + 9] = np32(blocks["b1"][l])
        out[base + 10] = np32(blocks["w2"][l]).T.copy()
        out[base + 11] = np32(blocks["b2"][l])
    base = 4 + WEIGHTS_PER_LAYER * L
    out[base + 0] = np32(params["ln_final"]["scale"])
    out[base + 1] = np32(params["ln_final"]["bias"])
    out[base + 2] = np32(params["head"]["kernel"]).T.copy()
    out[base + 3] = np32(params["head"]["bias"])
    return out


def save_reference_weights(
    tensors: Dict[int, np.ndarray], weight_dir, cfg: ViTConfig = VIT_B_16
) -> None:
    """Write tensors back out in the reference's Weight_{idx}_{name}.bin
    format (raw little-endian fp32, no header) — round-trip/testing tool."""
    weight_dir = Path(weight_dir)
    weight_dir.mkdir(parents=True, exist_ok=True)
    names = {idx: name for idx, name, _ in reference_tensor_specs(cfg)}
    for idx, arr in tensors.items():
        path = weight_dir / f"Weight_{idx}_{names[idx]}.bin"
        np.asarray(arr, dtype="<f4").tofile(path)

