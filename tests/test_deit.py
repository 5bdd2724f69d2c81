"""DeiT distilled family (Touvron et al. 2021): distillation token +
dual classifier heads, averaged at inference.

The reference family is torchvision-ViT-only (single CLS token,
ViT_seq.c:72-90); the distilled variants extend the framework without
touching the encoder kernels — T just grows by one prefix token.  These
tests gate every consumer: the jnp forward vs the NumPy fp64 oracle, the
fused/quant kernel paths (interpret), TP/PP/SP sharding, the HF DeiT
converter (cross-checked against transformers' own forward), and the
reference-format gates (the 152-tensor layout has no distillation token).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_tpu.config import CONFIGS, ViTConfig, get_config
from vit_tpu.models import oracle, vit
from vit_tpu.ops.dispatch import get_ops
from vit_tpu.parallel import make_mesh


@pytest.fixture(scope="module")
def deit_cfg() -> ViTConfig:
    """Tiny distilled config: every structural property of deit_b_16
    (CLS + distillation prefix, dual heads) at millisecond scale."""
    return ViTConfig(
        image_size=32,
        patch_size=8,
        embed_dim=64,
        depth=2,
        num_heads=4,
        num_classes=11,
        distilled=True,
        name="deit_tiny_test",
    )


@pytest.fixture(scope="module")
def deit_params(deit_cfg):
    return vit.init_params(jax.random.key(0), deit_cfg)


@pytest.fixture(scope="module")
def deit_images(deit_cfg):
    rng = np.random.default_rng(7)
    s = deit_cfg.image_size
    return jnp.asarray(rng.normal(size=(3, 3, s, s)), jnp.float32)


def test_registered_configs():
    for name in ("deit_t_16", "deit_s_16", "deit_b_16", "deit_b_16_384"):
        cfg = get_config(name)
        assert cfg.distilled and cfg.num_prefix_tokens == 2
        assert cfg.head_dim == 64  # the whole DeiT family is dh=64
    assert get_config("deit_b_16").seq_len == 198  # 196 patches + CLS + dist
    assert get_config("vit_b_16").seq_len == 197  # unchanged
    assert "deit_b_16_384" in CONFIGS


def test_num_params_matches_init(deit_cfg):
    params = vit.init_params(jax.random.key(1), deit_cfg)
    assert vit.num_params(params) == deit_cfg.num_params()
    assert "dist_token" in params and "head_dist" in params
    # non-distilled trees must NOT grow the new leaves
    plain = vit.init_params(
        jax.random.key(1), dataclasses.replace(deit_cfg, distilled=False)
    )
    assert "dist_token" not in plain and "head_dist" not in plain


def test_forward_matches_numpy_oracle(deit_cfg, deit_params, deit_images):
    """jnp forward (averaged dual head) == independent fp64 NumPy oracle."""
    got = np.asarray(vit.forward(deit_params, deit_images, deit_cfg))
    want = oracle.forward(deit_params, np.asarray(deit_images), deit_cfg)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_apply_head_average_semantics():
    """apply_head: logits == (head(x[0]) + head_dist(x[1])) / 2; without
    head_dist it degrades to the reference's CLS-only head
    (ViT_seq.c:433-435)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 6, 16)), jnp.float32)
    head = {
        "kernel": jnp.asarray(rng.normal(size=(16, 5)), jnp.float32),
        "bias": jnp.asarray(rng.normal(size=(5,)), jnp.float32),
    }
    head_dist = {
        "kernel": jnp.asarray(rng.normal(size=(16, 5)), jnp.float32),
        "bias": jnp.asarray(rng.normal(size=(5,)), jnp.float32),
    }
    xn = np.asarray(x)
    cls_want = xn[:, 0] @ np.asarray(head["kernel"]) + np.asarray(head["bias"])
    dist_want = xn[:, 1] @ np.asarray(head_dist["kernel"]) + np.asarray(
        head_dist["bias"]
    )
    got = np.asarray(
        vit.apply_head(x, {"head": head, "head_dist": head_dist})
    )
    np.testing.assert_allclose(got, 0.5 * (cls_want + dist_want), atol=1e-5)
    got_cls = np.asarray(vit.apply_head(x, {"head": head}))
    np.testing.assert_allclose(got_cls, cls_want, atol=1e-5)


def test_return_features_is_cls(deit_cfg, deit_params, deit_images):
    feats = vit.forward(
        deit_params, deit_images, deit_cfg, return_features=True
    )
    assert feats.shape == (3, deit_cfg.embed_dim)
    assert np.isfinite(np.asarray(feats)).all()


def test_fused_kernel_path_matches_xla(deit_cfg, deit_params, deit_images):
    """The megakernel path is token-count-generic: T=18 (16 patches + 2
    prefix) must match xla exactly like the T=197 family does."""
    a = np.asarray(
        vit.forward(deit_params, deit_images, deit_cfg, ops=get_ops("xla"))
    )
    b = np.asarray(
        vit.forward(deit_params, deit_images, deit_cfg, ops=get_ops("fused"))
    )
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_fused_train_grads_flow_to_both_heads(deit_cfg, deit_params, deit_images):
    from vit_tpu.runtime import trainer

    labels = jnp.asarray([1, 2, 3])

    def loss_fn(params):
        logits = vit.forward(
            params, deit_images, deit_cfg, ops=get_ops("fused_train")
        )
        return trainer.cross_entropy_loss(logits, labels)

    grads = jax.grad(loss_fn)(deit_params)
    for leaf in ("head", "head_dist"):
        g = np.asarray(grads[leaf]["kernel"])
        assert np.abs(g).max() > 0, f"no gradient reached {leaf}"
    assert np.abs(np.asarray(grads["dist_token"])).max() > 0
    # and the fused grads match autodiff through the xla path
    def loss_xla(params):
        logits = vit.forward(params, deit_images, deit_cfg, ops=get_ops("xla"))
        return trainer.cross_entropy_loss(logits, labels)

    gx = jax.grad(loss_xla)(deit_params)
    for a, b in zip(jax.tree.leaves(grads), jax.tree.leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_quant_path_close_to_fp(deit_cfg, deit_params, deit_images):
    """W8A8 kernel path on a distilled tree: the dual-head average must
    survive int8 noise — labels identical, logits close (the same gate as
    test_quant.py's non-distilled twin)."""
    from vit_tpu.ops.quant import quantize_params

    qp = quantize_params(deit_params)
    assert "dist_token" in qp and "head_dist" in qp  # pass through untouched
    got = np.asarray(
        vit.forward(qp, deit_images, deit_cfg, ops=get_ops("quant"))
    )
    want = np.asarray(vit.forward(deit_params, deit_images, deit_cfg))
    assert np.isfinite(got).all()
    assert (got.argmax(-1) == want.argmax(-1)).all()
    assert np.abs(got - want).max() < 0.15


def test_attention_rollout_strips_both_prefix_tokens(
    deit_cfg, deit_params, deit_images
):
    probs = vit.attention_maps(deit_params, deit_images, deit_cfg)
    t = deit_cfg.seq_len
    assert probs.shape[-2:] == (t, t)
    roll = vit.attention_rollout(probs, deit_cfg.num_prefix_tokens)
    assert roll.shape == (3, deit_cfg.num_patches)  # reshapeable to the grid


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 virtual devices")
def test_tp_forward_distilled(deit_cfg, deit_params, deit_images):
    from vit_tpu.parallel.sharding import shard_params
    from vit_tpu.parallel.tp_forward import shard_forward_tp

    mesh = make_mesh({"dp": 2, "tp": 2}, jax.devices()[:4])
    placed = shard_params(deit_params, mesh)
    fwd = shard_forward_tp(deit_cfg, mesh, "fused", placed)
    got = np.asarray(jax.jit(fwd)(placed, deit_images[:2]))
    want = np.asarray(vit.forward(deit_params, deit_images[:2], deit_cfg))
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.skipif(jax.device_count() < 2, reason="needs 2 virtual devices")
def test_pp_forward_distilled(deit_cfg, deit_params, deit_images):
    from jax.sharding import NamedSharding, PartitionSpec

    from vit_tpu.parallel.pipeline import pp_param_pspecs, shard_forward_pp

    mesh = make_mesh({"pp": 2}, jax.devices()[:2])
    specs = pp_param_pspecs(deit_params, mesh.axis_names)
    placed = jax.device_put(
        deit_params,
        jax.tree.map(
            lambda s: NamedSharding(mesh, s), specs,
            is_leaf=lambda x: isinstance(x, PartitionSpec),
        ),
    )
    fwd = shard_forward_pp(deit_cfg, mesh, num_microbatches=1)
    got = np.asarray(jax.jit(fwd)(placed, deit_images[:2]))
    want = np.asarray(vit.forward(deit_params, deit_images[:2], deit_cfg))
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 virtual devices")
def test_sp_forward_distilled(deit_params, deit_images, deit_cfg):
    """Ring-attention SP with a 2-token prefix on shard 0: 18 tokens over
    sp=4 -> t_local=5, partial padding — CLS and dist rows both gathered."""
    from vit_tpu.parallel.sequence import shard_forward_sp

    mesh = make_mesh({"sp": 4}, jax.devices()[:4])
    got = np.asarray(
        jax.jit(shard_forward_sp(deit_cfg, mesh))(deit_params, deit_images)
    )
    want = np.asarray(vit.forward(deit_params, deit_images, deit_cfg))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_resolution_transfer_preserves_both_prefix_rows(deit_cfg, deit_params):
    """Pos-table interpolation (io/interpolate.py) must pass BOTH prefix
    rows (CLS + dist) through untouched and resize only the patch grid."""
    from vit_tpu.io.interpolate import adapt_params_resolution

    to_cfg = deit_cfg.with_image_size(2 * deit_cfg.image_size)
    out = adapt_params_resolution(deit_params, deit_cfg, to_cfg)
    assert out["pos_embed"].shape == (to_cfg.seq_len, deit_cfg.embed_dim)
    np.testing.assert_array_equal(
        np.asarray(out["pos_embed"][:2]), np.asarray(deit_params["pos_embed"][:2])
    )
    # and the adapted tree actually runs at the new resolution
    rng = np.random.default_rng(1)
    s = to_cfg.image_size
    imgs = jnp.asarray(rng.normal(size=(2, 3, s, s)), jnp.float32)
    logits = vit.forward(out, imgs, to_cfg)
    assert np.isfinite(np.asarray(logits)).all()
    # distilled <-> non-distilled transfer is a config error, not a crash
    import dataclasses as _dc

    with pytest.raises(ValueError, match="matching architecture"):
        adapt_params_resolution(
            deit_params, deit_cfg, _dc.replace(to_cfg, distilled=False)
        )


def test_reference_format_gates(deit_cfg, deit_params, tmp_path):
    from vit_tpu.io import weights as wio
    from vit_tpu.io.torch_convert import tensors_from_state_dict

    with pytest.raises(ValueError, match="distill"):
        wio.load_reference_weights(tmp_path, deit_cfg, allow_synth=True)
    with pytest.raises(ValueError, match="distill"):
        wio.tensors_from_params(deit_params, deit_cfg)
    with pytest.raises(ValueError, match="distill"):
        tensors_from_state_dict({}, deit_cfg)


def test_training_converges_on_tiny_set(deit_cfg):
    """A few SGD steps on 8 images: loss decreases through the averaged
    dual head (both heads and the dist token receive signal)."""
    import optax

    from vit_tpu.runtime import trainer

    optimizer = optax.adam(1e-3)
    params, opt_state = trainer.init_train_state(
        jax.random.key(3), deit_cfg, optimizer
    )
    step = jax.jit(trainer.make_train_step(deit_cfg, optimizer, remat=False))
    rng = np.random.default_rng(0)
    s = deit_cfg.image_size
    images = jnp.asarray(rng.normal(size=(8, 3, s, s)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, deit_cfg.num_classes, 8), jnp.int32)
    losses = []
    p0 = np.asarray(params["dist_token"])
    for _ in range(10):
        params, opt_state, loss = step(params, opt_state, images, labels)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert np.abs(np.asarray(params["dist_token"]) - p0).max() > 0


def test_separate_heads_consistent_with_average(deit_cfg, deit_params, deit_images):
    cls_l, dist_l = vit.forward(
        deit_params, deit_images, deit_cfg, separate_heads=True
    )
    avg = np.asarray(vit.forward(deit_params, deit_images, deit_cfg))
    np.testing.assert_allclose(
        0.5 * (np.asarray(cls_l) + np.asarray(dist_l)), avg, atol=1e-5
    )
    plain = {k: v for k, v in deit_params.items() if k != "head_dist"}
    with pytest.raises(ValueError, match="head_dist"):
        vit.forward(plain, deit_images, deit_cfg, separate_heads=True)


def test_distillation_loss_semantics():
    from vit_tpu.runtime.trainer import cross_entropy_loss, distillation_loss

    rng = np.random.default_rng(5)
    cls_l = jnp.asarray(rng.normal(size=(6, 7)), jnp.float32)
    dist_l = jnp.asarray(rng.normal(size=(6, 7)), jnp.float32)
    teach = jnp.asarray(rng.normal(size=(6, 7)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 7, 6), jnp.int32)

    got = float(distillation_loss(cls_l, dist_l, y, teach, alpha=0.3))
    want = 0.7 * float(cross_entropy_loss(cls_l, y)) + 0.3 * float(
        cross_entropy_loss(dist_l, teach.argmax(-1))
    )
    assert abs(got - want) < 1e-6
    # soft KD is zero when the dist head already matches the teacher
    zero = float(
        distillation_loss(cls_l, teach, y, teach, alpha=1.0, hard=False)
    )
    assert abs(zero) < 1e-6
    pos = float(
        distillation_loss(cls_l, dist_l, y, teach, alpha=1.0, hard=False)
    )
    assert pos > 0


def test_distill_train_step_learns_teacher(deit_cfg):
    """Pure-KD (alpha=1) training: the student's distillation head converges
    toward the frozen teacher's argmax on a fixed batch."""
    import optax

    from vit_tpu.runtime import trainer

    teacher_cfg = dataclasses.replace(
        deit_cfg, distilled=False, depth=1, name="vit_teacher_test"
    )
    teacher = vit.init_params(jax.random.key(9), teacher_cfg)
    teacher_fwd = lambda x: vit.forward(teacher, x, teacher_cfg)

    optimizer = optax.adam(3e-3)
    params, opt_state = trainer.init_train_state(
        jax.random.key(4), deit_cfg, optimizer
    )
    step = jax.jit(
        trainer.make_distill_train_step(
            deit_cfg, optimizer, teacher_fwd, alpha=1.0, remat=False
        )
    )
    rng = np.random.default_rng(2)
    s = deit_cfg.image_size
    images = jnp.asarray(rng.normal(size=(8, 3, s, s)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, deit_cfg.num_classes, 8), jnp.int32)
    t_lab = np.asarray(teacher_fwd(images)).argmax(-1)

    losses = []
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state, images, labels)
        losses.append(float(loss))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
    _, dist_logits = vit.forward(params, images, deit_cfg, separate_heads=True)
    agree = (np.asarray(dist_logits).argmax(-1) == t_lab).mean()
    assert agree >= 0.75, agree
    # alpha=1: the true labels contribute nothing — CLS head must NOT have
    # converged to them (negative control that the split really routes)
    cls_logits, _ = vit.forward(params, images, deit_cfg, separate_heads=True)
    assert not (np.asarray(cls_logits).argmax(-1) == np.asarray(labels)).all()

    with pytest.raises(ValueError, match="distilled"):
        trainer.make_distill_train_step(
            dataclasses.replace(deit_cfg, distilled=False),
            optimizer, teacher_fwd,
        )


def test_distill_fused_train_matches_xla(deit_cfg):
    """--distill-teacher through the fused kernels (VERDICT r4 item 3):
    (a) teacher logits through the fused inference megakernels match the
    xla teacher to 1e-4; (b) one distillation step on the fused_train
    shard_map path (student custom-VJP kernels + fused teacher) produces
    the same loss and updated params as the GSPMD xla distill step."""
    import optax

    from jax.sharding import Mesh

    from vit_tpu.runtime import trainer

    if jax.device_count() < 2:
        pytest.skip("needs 2 virtual devices")

    teacher_cfg = dataclasses.replace(
        deit_cfg, distilled=False, depth=1, name="vit_teacher_test"
    )
    teacher = vit.init_params(jax.random.key(9), teacher_cfg)
    rng = np.random.default_rng(3)
    s = deit_cfg.image_size
    images = jnp.asarray(rng.normal(size=(8, 3, s, s)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, deit_cfg.num_classes, 8), jnp.int32)

    # (a) teacher-logit parity gate: fused megakernels vs jnp reference
    t_xla = np.asarray(vit.forward(teacher, images, teacher_cfg))
    t_fused = np.asarray(
        vit.forward(teacher, images, teacher_cfg, get_ops("fused"))
    )
    assert np.abs(t_fused - t_xla).max() < 1e-4

    # (b) one full distillation step, fused_train vs xla
    optimizer = optax.sgd(1e-2)
    params0, opt0 = trainer.init_train_state(
        jax.random.key(4), deit_cfg, optimizer
    )
    xla_step = jax.jit(
        trainer.make_distill_train_step(
            deit_cfg, optimizer,
            lambda x: vit.forward(teacher, x, teacher_cfg),
            alpha=0.5, hard=True, remat=False,
        )
    )
    p1, _, l1 = xla_step(
        jax.tree.map(jnp.copy, params0), opt0, images, labels
    )

    mesh = Mesh(np.array(jax.devices()[:2]), ("dp",))
    fused_step = trainer.jit_train_step_dp_shard_map(
        deit_cfg, optimizer, mesh, get_ops("fused_train"), remat=False,
        distill=dict(
            teacher_fwd=lambda x: vit.forward(
                teacher, x, teacher_cfg, get_ops("fused")
            ),
            alpha=0.5, hard=True, tau=1.0,
        ),
    )
    p2, _, l2 = fused_step(
        jax.tree.map(jnp.copy, params0), opt0, images, labels
    )
    assert abs(float(l1) - float(l2)) < 1e-5
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(jax.device_get(p2))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)

    # distill excludes the other loss-shaping knobs on this path
    with pytest.raises(ValueError, match="composes with none"):
        trainer.jit_train_step_dp_shard_map(
            deit_cfg, optimizer, mesh, get_ops("fused_train"), remat=False,
            use_dropout=True,
            distill=dict(teacher_fwd=lambda x: x, alpha=0.5, hard=True,
                         tau=1.0),
        )


@pytest.mark.skipif(jax.device_count() < 2, reason="needs 2 virtual devices")
def test_train_cli_distillation_fused(deit_cfg, monkeypatch, capsys, tmp_path):
    """--distill-teacher --ops fused_train: the flagship training recipe on
    the flagship kernels (teacher rides the fused inference megakernels)."""
    import vit_tpu.config as config_mod
    from vit_tpu.cli.train import main as train_main
    from vit_tpu.io import checkpoint as ckpt

    monkeypatch.setitem(config_mod.CONFIGS, "deit_tiny_test", deit_cfg)
    teacher_cfg = dataclasses.replace(
        deit_cfg, distilled=False, name="teacher_tiny"
    )
    teacher = vit.init_params(jax.random.key(11), teacher_cfg)
    ckpt.save_npz(teacher, tmp_path / "teacher.npz")

    rc = train_main([
        "--config", "deit_tiny_test", "--steps", "2", "--batch", "4",
        "--dp", "2", "--ops", "fused_train",
        "--distill-teacher", str(tmp_path / "teacher.npz"),
        "--no-compile-cache",
    ])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "[teacher on fused kernels]" in out and "step    1" in out

    # kernel-TP has no teacher leg: fused_train distill is dp-only
    rc = train_main([
        "--config", "deit_tiny_test", "--steps", "1", "--batch", "4",
        "--tp", "2", "--ops", "fused_train",
        "--distill-teacher", str(tmp_path / "teacher.npz"),
        "--no-compile-cache",
    ])
    assert rc == 2
    assert "kernel-TP" in capsys.readouterr().err


def test_train_cli_distillation_int8_teacher(deit_cfg, monkeypatch, capsys,
                                             tmp_path):
    """--distill-teacher-int8: the frozen teacher through the W8A8 quant
    kernels (labels-preserved contract) — the teacher's argmax targets
    must agree with the fused teacher's on decisive rows."""
    import vit_tpu.config as config_mod
    from vit_tpu.cli.train import main as train_main
    from vit_tpu.io import checkpoint as ckpt

    monkeypatch.setitem(config_mod.CONFIGS, "deit_tiny_test", deit_cfg)
    teacher_cfg = dataclasses.replace(
        deit_cfg, distilled=False, name="teacher_tiny"
    )
    teacher = vit.init_params(jax.random.key(11), teacher_cfg)
    ckpt.save_npz(teacher, tmp_path / "teacher.npz")

    rc = train_main([
        "--config", "deit_tiny_test", "--steps", "2", "--batch", "4",
        "--dp", "2", "--ops", "fused_train",
        "--distill-teacher", str(tmp_path / "teacher.npz"),
        "--distill-teacher-int8", "--no-compile-cache",
    ])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "[teacher on W8A8 kernels]" in out and "step    1" in out

    # int8 teacher needs the fused_train step
    rc = train_main([
        "--config", "deit_tiny_test", "--steps", "1", "--batch", "4",
        "--dp", "2", "--ops", "xla",
        "--distill-teacher", str(tmp_path / "teacher.npz"),
        "--distill-teacher-int8", "--no-compile-cache",
    ])
    assert rc == 2
    assert "fused_train" in capsys.readouterr().err

    # target agreement: int8 teacher's argmax == fp teacher's on rows
    # where the fp teacher is decisive (the labels-preserved contract)
    from vit_tpu.models import vit as vit_mod
    from vit_tpu.ops import quant as q_mod, reference as ref_ops
    from vit_tpu.ops.dispatch import get_ops

    rng = np.random.default_rng(3)
    x = jnp.asarray(
        rng.normal(size=(8, 3, deit_cfg.image_size, deit_cfg.image_size)),
        jnp.float32,
    )
    fp_logits = np.asarray(vit_mod.forward(teacher, x, teacher_cfg))
    qp = q_mod.quantize_params(teacher)
    q_logits = np.asarray(
        vit_mod.forward(qp, x, teacher_cfg, get_ops("quant"))
    )
    fp_probs = np.asarray(ref_ops.softmax(jnp.asarray(fp_logits)))
    top2 = np.partition(fp_probs, -2, axis=-1)[:, -2:]
    decisive = (top2[:, 1] - top2[:, 0]) > 0.01
    agree = fp_logits.argmax(-1) == q_logits.argmax(-1)
    assert (agree | ~decisive).all()


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 virtual devices")
def test_train_cli_distillation(deit_cfg, monkeypatch, capsys, tmp_path):
    """vit-tpu-train --distill-teacher end to end: teacher npz -> 2 steps of
    hard distillation on a dp mesh."""
    import vit_tpu.config as config_mod
    from vit_tpu.cli.train import main as train_main
    from vit_tpu.io import checkpoint as ckpt

    monkeypatch.setitem(config_mod.CONFIGS, "deit_tiny_test", deit_cfg)
    teacher_cfg = dataclasses.replace(
        deit_cfg, distilled=False, name="teacher_tiny"
    )
    teacher = vit.init_params(jax.random.key(11), teacher_cfg)
    ckpt.save_npz(teacher, tmp_path / "teacher.npz")

    rc = train_main([
        "--config", "deit_tiny_test", "--steps", "2", "--batch", "4",
        "--dp", "4", "--distill-teacher", str(tmp_path / "teacher.npz"),
        "--save", str(tmp_path / "student.npz"), "--no-compile-cache",
    ])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "distillation: teacher" in out and "step    1" in out
    assert "ops: xla" in out  # auto resolves to the separate-head path
    assert (tmp_path / "student.npz").exists()
    student = ckpt.load_npz(tmp_path / "student.npz")
    assert "dist_token" in student and "head_dist" in student


def test_train_cli_distillation_flag_validation(deit_cfg, monkeypatch, capsys,
                                                tmp_path):
    import vit_tpu.config as config_mod
    from vit_tpu.cli.train import main as train_main

    monkeypatch.setitem(config_mod.CONFIGS, "deit_tiny_test", deit_cfg)
    # non-distilled student config
    rc = train_main([
        "--config", "vit_b_16", "--steps", "1", "--batch", "8", "--dp", "1",
        "--distill-teacher", "x.npz", "--no-compile-cache",
    ])
    assert rc == 2
    assert "distilled student" in capsys.readouterr().err
    # incompatible regularizer path
    rc = train_main([
        "--config", "deit_tiny_test", "--steps", "1", "--batch", "8",
        "--dp", "1", "--distill-teacher", "x.npz", "--augment", "flip",
        "--no-compile-cache",
    ])
    assert rc == 2
    assert "--dp/--tp only" in capsys.readouterr().err


def test_freeze_backbone_trains_both_heads(deit_cfg):
    """--freeze-backbone on a distilled tree must train head AND head_dist:
    apply_head averages the two, so a frozen head_dist would mix 50%
    frozen-random logits into every prediction (review regression)."""
    from vit_tpu.cli.train_args import build_parser
    from vit_tpu.cli.train_setup import _build_optimizer

    args = build_parser().parse_args(["--freeze-backbone"])
    opt = _build_optimizer(args, 0.1)
    params = vit.init_params(jax.random.key(0), deit_cfg)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = opt.update(grads, opt.init(params), params)
    assert np.abs(np.asarray(updates["head"]["kernel"])).max() > 0
    assert np.abs(np.asarray(updates["head_dist"]["kernel"])).max() > 0
    assert np.abs(np.asarray(updates["blocks"]["wqkv"])).max() == 0
    assert np.abs(np.asarray(updates["dist_token"])).max() == 0


def test_distill_teacher_head_width_validated(deit_cfg, monkeypatch, capsys,
                                              tmp_path):
    """A teacher npz with a different class count must fail loudly at setup
    — hard KD would otherwise clamp out-of-range argmax labels silently."""
    import vit_tpu.config as config_mod
    from vit_tpu.cli.train import main as train_main
    from vit_tpu.io import checkpoint as ckpt

    monkeypatch.setitem(config_mod.CONFIGS, "deit_tiny_test", deit_cfg)
    wide_cfg = dataclasses.replace(
        deit_cfg, distilled=False, num_classes=deit_cfg.num_classes + 7,
        name="teacher_wide",
    )
    ckpt.save_npz(
        vit.init_params(jax.random.key(12), wide_cfg), tmp_path / "t.npz"
    )
    rc = train_main([
        "--config", "deit_tiny_test", "--steps", "1", "--batch", "8",
        "--dp", "1", "--distill-teacher", str(tmp_path / "t.npz"),
        "--no-compile-cache",
    ])
    assert rc == 2
    assert "label space" in capsys.readouterr().err


def test_convert_cli_distilled_to_reference_fails_cleanly(deit_cfg,
                                                          monkeypatch,
                                                          capsys, tmp_path):
    """Exporting a distilled tree to the reference layout is a clean CLI
    error (exit 2), not a traceback (review regression)."""
    import vit_tpu.config as config_mod
    from vit_tpu.cli.convert import main as convert_main
    from vit_tpu.io import checkpoint as ckpt

    monkeypatch.setitem(config_mod.CONFIGS, "deit_tiny_test", deit_cfg)
    ckpt.save_npz(
        vit.init_params(jax.random.key(13), deit_cfg), tmp_path / "d.npz"
    )
    rc = convert_main([
        "--from", str(tmp_path / "d.npz"), "--to", str(tmp_path / "Network"),
        "--config", "deit_tiny_test",
    ])
    assert rc == 2
    err = capsys.readouterr().err
    assert err.startswith("error:") and "distill" in err


# ---- HF transformers DeiT converter cross-checks ------------------------

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

from vit_tpu.io.hf_convert import config_from_hf, params_from_hf_state_dict  # noqa: E402


def _tiny_deit_cfg():
    return transformers.DeiTConfig(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=256,
        image_size=32,
        patch_size=16,
        num_channels=3,
        num_labels=11,
        hidden_act="gelu",
    )


@pytest.fixture(scope="module")
def hf_deit_teacher():
    torch.manual_seed(0)
    hf_cfg = _tiny_deit_cfg()
    model = transformers.DeiTForImageClassificationWithTeacher(hf_cfg).eval()
    return hf_cfg, model


def test_hf_deit_config_mapping(hf_deit_teacher):
    hf_cfg, _ = hf_deit_teacher
    cfg = config_from_hf(hf_cfg)
    assert cfg.distilled
    assert cfg.seq_len == 6  # (32/16)^2 + CLS + dist


def test_hf_deit_teacher_logits_match(hf_deit_teacher):
    """Converted params through our forward == transformers'
    DeiTForImageClassificationWithTeacher forward (which averages the CLS
    and distillation classifier logits at eval)."""
    hf_cfg, model = hf_deit_teacher
    cfg = config_from_hf(hf_cfg)
    params = params_from_hf_state_dict(model.state_dict(), cfg)
    assert "dist_token" in params and "head_dist" in params
    params = jax.tree.map(jnp.asarray, params)

    rng = np.random.default_rng(0)
    images = rng.normal(size=(3, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(images)).logits.numpy()
    got = np.asarray(vit.forward(params, jnp.asarray(images), cfg))
    np.testing.assert_allclose(got, want, atol=2e-4)
    assert (got.argmax(-1) == want.argmax(-1)).all()


def test_hf_deit_single_head_logits_match():
    """Plain DeiTForImageClassification (no teacher head): the distillation
    token rides through the encoder but only the CLS head classifies."""
    torch.manual_seed(1)
    hf_cfg = _tiny_deit_cfg()
    model = transformers.DeiTForImageClassification(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg)
    params = params_from_hf_state_dict(model.state_dict(), cfg)
    assert "dist_token" in params and "head_dist" not in params
    params = jax.tree.map(jnp.asarray, params)

    rng = np.random.default_rng(1)
    images = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(images)).logits.numpy()
    got = np.asarray(vit.forward(params, jnp.asarray(images), cfg))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_convert_cli_headless_deit_refuses(tmp_path, capsys):
    """A DeiT backbone with NO classifier head in either layout must fail
    cleanly instead of exporting random-initialized classifier weights."""
    torch.manual_seed(2)
    model = transformers.DeiTModel(_tiny_deit_cfg())
    src = tmp_path / "headless"
    model.save_pretrained(src)

    from vit_tpu.cli.convert import main as convert_main

    rc = convert_main([
        "--hf", "--from", str(src), "--to", str(tmp_path / "out.npz"),
        "--config", "deit_b_16",
    ])
    assert rc == 2
    assert "no classifier head" in capsys.readouterr().err
    assert not (tmp_path / "out.npz").exists()


def test_hf_deit_config_mismatch_actionable(hf_deit_teacher):
    """Converting a DeiT checkpoint under a non-distilled config must fail
    with a message naming the fix, not a reshape error."""
    hf_cfg, model = hf_deit_teacher
    cfg = dataclasses.replace(config_from_hf(hf_cfg), distilled=False)
    with pytest.raises(ValueError, match="distill"):
        params_from_hf_state_dict(model.state_dict(), cfg)
