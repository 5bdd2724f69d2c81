"""ToMe token merging (Bolya et al. 2022, "Token Merging: Your ViT But
Faster") — inference-time acceleration by merging the r most similar token
pairs per layer.

The reference (and this framework's parity paths) runs every layer at the
full token count; the round-3 floor study (docs/performance.md) showed the
bf16 headline sits at a MEASURED structural floor at fixed arithmetic —
"breaking it means changing the arithmetic".  ToMe is exactly that change:
a static per-layer merge schedule shrinks T as depth grows (197 -> 197-r·l
for B/16), trading a controlled approximation for throughput.  Everything
here is static-shape (r is fixed per layer), so XLA compiles one program
per layer and the merge itself is gather/scatter — no dynamic shapes.

Algorithm (the paper's bipartite soft matching, between the attention and
MLP halves of each block):

  1. metric = mean over heads of the attention KEYS (already computed by
     the QKV projection; the fused kernel A emits it for free).
  2. Split non-protected tokens alternately into sets A and B; each
     A-token scores its most similar B-token (cosine similarity).
  3. The r highest-scoring A-tokens merge into their B matches by
     size-weighted average; everything else passes through.
  4. Token sizes track how many original patches each token represents;
     subsequent attention adds log(size) to the key logits ("proportional
     attention") so merged tokens keep their aggregate influence.

Protected prefix tokens (CLS, and DeiT's distillation token) never merge.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def merge_counts(seq_len: int, depth: int, r: int, protected: int = 1):
    """Per-layer merge counts: r per layer, clipped so at least
    ``protected + 32`` tokens survive to the final layer.

    The floor is deliberately conservative: layers below ~30 tokens are
    FLOP-trivial (nothing to save), accuracy margin improves, and the
    fused path's composed 36-kernel program was bisected to hard-fault
    the TPU worker when the tail layers shrank into the low tens (every
    sub-program passes in isolation — r=13's T=41 tail runs, r=16's
    T=21/11 tail crashed; models/tome.forward_fused)."""
    floor = protected + 32
    counts = []
    t = seq_len
    for _ in range(depth):
        # the A-set of ceil((t-p)/2) tokens bounds how many pairs exist
        rl = min(r, max(0, t - floor), (t - protected) // 2)
        counts.append(rl)
        t -= rl
    return counts


def compress_counts(counts, chunk: int, seq_len: int, protected: int = 1):
    """Re-bucket a per-layer merge schedule so each group of ``chunk``
    consecutive layers merges its whole budget at the group's FIRST layer.

    Same (or near-same) total reduction and same (or slightly lower)
    total row count — merging earlier within a group means FEWER tokens
    in the group's tail layers — but the distinct token-count set shrinks
    from ~depth values to ~depth/chunk: the fused path compiles ~3x fewer
    distinct kernel programs, which is what keeps long unrolled chains
    inside this backend's validated envelope (docs/performance.md
    backend-fault log).

    A group's budget can exceed the bipartite A-set at its start layer
    even when the per-layer schedule was valid (the per-layer caps were
    taken at each layer's own, larger-sum t): aggressive r at depth hits
    this — r=14 on B/16 wants 38 pairs at t=71 where only 35 exist.  Each
    group therefore takes ``min(budget, (t - protected) // 2)`` and
    carries the excess into the next group (whose cap is evaluated at its
    own live t); any residue after the last group is dropped.  The total
    never exceeds the per-layer schedule's, so the T floor
    (:func:`merge_counts`) still holds, and the result passes
    :func:`validate_counts` by construction."""
    if chunk <= 1:
        return list(counts)
    out = [0] * len(counts)
    t, carry = seq_len, 0
    for g0 in range(0, len(counts), chunk):
        want = sum(counts[g0 : g0 + chunk]) + carry
        take = min(want, (t - protected) // 2)
        out[g0] = take
        carry = want - take
        t -= take
    return out


def validate_counts(counts, seq_len: int, protected: int = 1):
    """Assert a merge schedule is executable: every layer's count fits the
    bipartite A-set at that layer's live token count."""
    t = seq_len
    for l, rl in enumerate(counts):
        if rl > (t - protected) // 2:
            raise ValueError(
                f"layer {l} merges {rl} pairs but only "
                f"{(t - protected) // 2} exist at t={t}"
            )
        t -= rl
    return counts


def merge_matrix(metric: jax.Array, size: jax.Array, r: int, protected: int = 1):
    """Batched merge operator as a DENSE matrix: (B, T, Dm) metric +
    (B, T) sizes -> (W (B, T-r, T) fp32, s_out (B, T-r)).

    The merge then is one MXU-friendly batched GEMM,
    ``x_out = (W @ x) / s_out`` (:func:`apply_merge_matrix`), instead of
    the vmapped argsort+gather+scatter chains — cheaper between the fused
    kernels (a (T-r, T, D) GEMM is ~2% of a layer's FLOPs), and trivially
    differentiable for train-time ToMe (gradients flow through the GEMM;
    the matching itself is piecewise-constant, i.e. stop-gradient, exactly
    the ToMe paper's training treatment).  Row layout matches
    :func:`merge_tokens`: [protected | surviving A (original order) | B]."""
    if r <= 0:
        raise ValueError("merge_matrix needs r > 0")
    return jax.vmap(
        lambda mi, si: _merge_matrix_one(mi, si, r, protected)
    )(metric, size)


def _merge_matrix_one(metric, size, r, protected):
    t = metric.shape[0]
    n = t - protected
    mr = metric[protected:].astype(jnp.float32)
    mr = mr / (jnp.linalg.norm(mr, axis=-1, keepdims=True) + 1e-6)
    a_idx = jnp.arange(0, n, 2)
    b_idx = jnp.arange(1, n, 2)
    na, nb = a_idx.shape[0], b_idx.shape[0]
    scores = mr[a_idx] @ mr[b_idx].T
    best = jnp.argmax(scores, axis=-1)
    best_val = jnp.take_along_axis(scores, best[:, None], axis=-1)[:, 0]
    order = jnp.argsort(-best_val)
    src = order[:r]              # A-rows that merge away
    keep = jnp.sort(order[r:])   # A-rows that survive, original order
    dst = best[src]              # B-slots receiving them

    t_out = t - r
    w = jnp.zeros((t_out, t), jnp.float32)
    sz = size.astype(jnp.float32)
    pidx = jnp.arange(protected)
    w = w.at[pidx, pidx].set(sz[:protected])
    # surviving A rows, original order
    rows_a = protected + jnp.arange(na - r)
    cols_a = protected + a_idx[keep]
    w = w.at[rows_a, cols_a].set(sz[cols_a])
    # all B rows
    rows_b = protected + (na - r) + jnp.arange(nb)
    cols_b = protected + b_idx
    w = w.at[rows_b, cols_b].set(sz[cols_b])
    # merged A rows land in their B destination rows
    rows_m = protected + (na - r) + dst
    cols_m = protected + a_idx[src]
    w = w.at[rows_m, cols_m].add(sz[cols_m])
    return w, w.sum(axis=-1)


def apply_merge_matrix(x: jax.Array, w: jax.Array, s_out: jax.Array) -> jax.Array:
    """x (B, T, D) through the merge operator: (W @ x) / s_out — the
    size-weighted average as one batched GEMM (fp32 accumulate)."""
    acc = jnp.einsum(
        "bot,btd->bod", w, x.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    return (acc / s_out[..., None]).astype(x.dtype)


def _merge_one(
    x: jax.Array, metric: jax.Array, size: jax.Array, r: int, protected: int
) -> Tuple[jax.Array, jax.Array]:
    """Single image: (T, D) tokens + (T, Dm) metric + (T,) sizes ->
    ((T - r, D), (T - r,)) after merging the r best bipartite pairs."""
    t, d = x.shape
    if r <= 0:
        return x, size
    xp, sp = x[:protected], size[:protected]
    xr, mr, sr = x[protected:], metric[protected:], size[protected:]
    n = t - protected
    # cosine similarity: normalize the metric rows (fp32 for stability)
    mr = mr.astype(jnp.float32)
    mr = mr / (jnp.linalg.norm(mr, axis=-1, keepdims=True) + 1e-6)
    a_idx = jnp.arange(0, n, 2)  # alternating split (paper's assignment)
    b_idx = jnp.arange(1, n, 2)
    ma, mb = mr[a_idx], mr[b_idx]
    scores = ma @ mb.T  # (na, nb)
    best = jnp.argmax(scores, axis=-1)  # each A-token's B match
    best_val = jnp.take_along_axis(scores, best[:, None], axis=-1)[:, 0]
    order = jnp.argsort(-best_val)  # most similar first
    src = order[:r]              # A-rows that merge away
    keep = jnp.sort(order[r:])   # A-rows that survive, original order
    dst = best[src]              # B-slots receiving them

    xa, sa = xr[a_idx], sr[a_idx]
    xb, sb = xr[b_idx], sr[b_idx]
    # size-weighted average into the destination B slots (fp32 accumulate)
    wsum = (xb.astype(jnp.float32) * sb[:, None]).at[dst].add(
        xa[src].astype(jnp.float32) * sa[src][:, None]
    )
    sb_new = sb.at[dst].add(sa[src])
    xb_new = (wsum / sb_new[:, None]).astype(x.dtype)

    x_out = jnp.concatenate([xp, xa[keep], xb_new], axis=0)
    s_out = jnp.concatenate([sp, sa[keep], sb_new], axis=0)
    return x_out, s_out


def merge_tokens(
    x: jax.Array, metric: jax.Array, size: jax.Array, r: int,
    protected: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    """Batched bipartite soft matching merge.

    x (B, T, D): tokens; metric (B, T, Dm): similarity space (mean
    attention keys); size (B, T): how many original tokens each row
    represents.  Returns ((B, T - r, D), (B, T - r)).  The first
    ``protected`` rows (CLS / distillation token) never merge."""
    if r <= 0:
        return x, size
    return jax.vmap(lambda xi, mi, si: _merge_one(xi, mi, si, r, protected))(
        x, metric, size
    )
