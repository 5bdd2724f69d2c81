"""CLI driver end-to-end tests (replaces Main.c's manual flow) on tiny
synthetic checkpoints."""

import sys

import numpy as np
import pytest

from vit_tpu.cli.main import main
from vit_tpu.eval import comparator as C
from vit_tpu.io import images as iio
from vit_tpu.io import weights as wio


@pytest.fixture()
def tiny_checkpoint(tmp_path, tiny_cfg):
    wio.save_reference_weights(
        wio.synth_reference_tensors(tiny_cfg, seed=1), tmp_path / "Network", tiny_cfg
    )
    iio.save_image_bin(
        iio.synth_images(4, tiny_cfg, seed=2), tmp_path / "input.bin"
    )
    return tmp_path


def _run(args):
    return main([str(a) for a in args])


def test_cli_end_to_end(tiny_checkpoint, tiny_cfg, capsys, monkeypatch):
    import vit_tpu.config as config_mod

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    out_file = tiny_checkpoint / "result.txt"
    rc = _run([
        "--config", "vit_tiny_test", "--weights", tiny_checkpoint / "Network",
        "--input", tiny_checkpoint / "input.bin", "--output", out_file,
        "--dtype", "float32", "--ops", "xla", "--batch-pad", "4",
    ])
    assert rc == 0
    lines = C.parse_result_file(out_file)
    assert len(lines) == 4
    stdout = capsys.readouterr().out
    assert "[0] label:" in stdout


def test_cli_golden_compare_self(tiny_checkpoint, tiny_cfg, capsys, monkeypatch):
    # Run once to produce a result file, then use it as its own golden:
    # comparator must report 0 errors and exit 0.
    import vit_tpu.config as config_mod

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    out_file = tiny_checkpoint / "result.txt"
    args = [
        "--config", "vit_tiny_test", "--weights", tiny_checkpoint / "Network",
        "--input", tiny_checkpoint / "input.bin", "--output", out_file,
        "--dtype", "float32", "--ops", "xla", "--batch-pad", "4",
    ]
    assert _run(args) == 0
    assert _run(args + ["--golden", out_file]) == 0
    assert "comparator: 0 error(s)" in capsys.readouterr().out


def test_cli_quant_ops(tiny_checkpoint, tiny_cfg, capsys, monkeypatch):
    # The W8A8 path is CLI-reachable (VERDICT r1: 'quant' was library-only).
    import vit_tpu.config as config_mod

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    rc = _run([
        "--config", "vit_tiny_test", "--weights", tiny_checkpoint / "Network",
        "--input", tiny_checkpoint / "input.bin",
        "--dtype", "float32", "--ops", "quant", "--batch-pad", "4",
        "--no-compile-cache",
    ])
    assert rc == 0
    stdout = capsys.readouterr().out
    assert "[0] label:" in stdout and "ops: quant" in stdout


def test_cli_quant_rejects_fp_probes_upfront(tiny_checkpoint, tiny_cfg,
                                             capsys, monkeypatch):
    """--ops quant with --attn-rollout/--profile is knowable-at-parse-time
    incompatible; it must exit 2 BEFORE loading weights or running
    inference (the engine raises the same error only after minutes)."""
    import vit_tpu.config as config_mod

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    for probe_flag in (["--attn-rollout", "x.npz"], ["--profile"]):
        rc = _run([
            "--config", "vit_tiny_test",
            "--weights", tiny_checkpoint / "Network",
            "--input", tiny_checkpoint / "input.bin",
            "--ops", "quant", "--no-compile-cache", *probe_flag,
        ])
        assert rc == 2
        err = capsys.readouterr().err
        assert "need fp weights" in err


def test_cli_fused_tp_mesh(tiny_checkpoint, tiny_cfg, capsys, monkeypatch):
    import jax

    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    import vit_tpu.config as config_mod

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    rc = _run([
        "--config", "vit_tiny_test", "--weights", tiny_checkpoint / "Network",
        "--input", tiny_checkpoint / "input.bin",
        "--dtype", "float32", "--ops", "fused", "--batch-pad", "4",
        "--dp", "2", "--tp", "2", "--no-compile-cache",
    ])
    assert rc == 0
    stdout = capsys.readouterr().out
    assert "mesh: {'dp': 2, 'tp': 2}" in stdout


def test_train_cli_fused_train_mixed_precision(tiny_cfg, monkeypatch, capsys, tmp_path):
    import jax

    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    import vit_tpu.config as config_mod
    from vit_tpu.cli.train import main as train_main

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    rc = train_main([
        "--config", "vit_tiny_test", "--steps", "2", "--batch", "4",
        "--dp", "4", "--ops", "fused_train", "--mixed-precision",
        "--save", str(tmp_path / "p.npz"), "--no-compile-cache",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "ops: fused_train" in out and "step    1" in out
    assert (tmp_path / "p.npz").exists()


def test_train_cli_fused_adamw(tiny_cfg, monkeypatch, capsys):
    import jax

    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    import vit_tpu.config as config_mod
    from vit_tpu.cli.train import main as train_main

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    rc = train_main([
        "--config", "vit_tiny_test", "--steps", "2", "--batch", "4",
        "--dp", "4", "--ops", "fused_train", "--optimizer", "fused_adamw",
        "--no-compile-cache",
    ])
    assert rc == 0
    assert "step    1" in capsys.readouterr().out


def test_train_cli_zero1(tiny_cfg, monkeypatch, capsys):
    # --zero1 shards the optimizer state over dp on both the GSPMD (xla)
    # and fused_train (shard_map dp) paths; --pp rejects it cleanly.
    import jax

    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    import vit_tpu.config as config_mod
    from vit_tpu.cli.train import main as train_main

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    for ops in ("xla", "fused_train"):
        rc = train_main([
            "--config", "vit_tiny_test", "--steps", "2", "--batch", "4",
            "--dp", "4", "--ops", ops, "--zero1", "--no-compile-cache",
        ])
        assert rc == 0, ops
        assert "step    1" in capsys.readouterr().out
    rc = train_main([
        "--config", "vit_tiny_test", "--steps", "1", "--batch", "4",
        "--pp", "2", "--zero1", "--no-compile-cache",
    ])
    assert rc != 0
    assert "--zero1" in capsys.readouterr().err
    # the in-place Pallas AdamW kernel owns whole leaves — reject too
    rc = train_main([
        "--config", "vit_tiny_test", "--steps", "1", "--batch", "4",
        "--dp", "4", "--ops", "fused_train", "--optimizer", "fused_adamw",
        "--zero1", "--no-compile-cache",
    ])
    assert rc != 0
    assert "fused_adamw" in capsys.readouterr().err


def test_train_cli_fsdp(tiny_cfg, monkeypatch, capsys):
    # --fsdp (ZeRO-3) trains on the GSPMD path; kernel paths reject it.
    import jax

    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    import vit_tpu.config as config_mod
    from vit_tpu.cli.train import main as train_main

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    rc = train_main([
        "--config", "vit_tiny_test", "--steps", "2", "--batch", "4",
        "--dp", "4", "--ops", "xla", "--fsdp", "--no-compile-cache",
    ])
    assert rc == 0
    assert "step    1" in capsys.readouterr().out
    rc = train_main([
        "--config", "vit_tiny_test", "--steps", "1", "--batch", "4",
        "--dp", "4", "--ops", "fused_train", "--fsdp", "--no-compile-cache",
    ])
    assert rc != 0
    assert "--fsdp" in capsys.readouterr().err


def test_train_cli_fused_train_with_tp(tiny_cfg, monkeypatch, capsys):
    # Round 2: fused_train trains tensor-parallel via the kernel-TP step
    # (trainer.jit_train_step_kernel_tp) — was rejected before.
    import jax

    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    import vit_tpu.config as config_mod
    from vit_tpu.cli.train import main as train_main

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    rc = train_main([
        "--config", "vit_tiny_test", "--steps", "2", "--batch", "4",
        "--dp", "2", "--tp", "2", "--ops", "fused_train", "--no-compile-cache",
    ])
    assert rc == 0
    assert "step    1" in capsys.readouterr().out


def test_train_cli_pipeline_parallel(tiny_cfg, monkeypatch, capsys):
    """--pp from the driver: dp x pp training over the layer-stack seam."""
    import jax

    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    import vit_tpu.config as config_mod
    from vit_tpu.cli.train import main as train_main

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    rc = train_main([
        "--config", "vit_tiny_test", "--steps", "2", "--batch", "8",
        "--dp", "2", "--pp", "2", "--microbatches", "2", "--ops", "xla",
        "--no-compile-cache",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "pipeline: 2 stage(s), 2 microbatches" in out
    assert "step    1" in out


def test_train_cli_3d_parallel_fused(tiny_cfg, monkeypatch, capsys):
    """--dp 2 --pp 2 --tp 2: full 3D training through the fused kernels
    from the driver."""
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    import vit_tpu.config as config_mod
    from vit_tpu.cli.train import main as train_main

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    rc = train_main([
        "--config", "vit_tiny_test", "--steps", "2", "--batch", "4",
        "--dp", "2", "--pp", "2", "--tp", "2", "--microbatches", "2",
        "--ops", "fused_train", "--no-compile-cache",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "mesh: {'dp': 2, 'pp': 2, 'tp': 2}" in out
    assert "step    1" in out


def test_train_cli_log_jsonl(tiny_cfg, monkeypatch, tmp_path, capsys):
    import json

    import vit_tpu.config as config_mod
    from vit_tpu.cli.train import main as train_main

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    log = tmp_path / "metrics.jsonl"
    rc = train_main([
        "--config", "vit_tiny_test", "--steps", "3", "--batch", "4",
        "--dp", "1", "--ops", "xla", "--no-compile-cache",
        "--log-jsonl", str(log),
    ])
    assert rc == 0
    lines = [json.loads(l) for l in log.read_text().splitlines()]
    assert [l["step"] for l in lines] == [0, 1, 2]
    assert all(np.isfinite(l["loss"]) and l["images_per_sec"] > 0
               for l in lines)


def test_train_cli_pp_validates(tiny_cfg, monkeypatch, capsys):
    import vit_tpu.config as config_mod
    from vit_tpu.cli.train import main as train_main

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    # pp x tp needs the tensor-parallel fused block
    rc = train_main([
        "--config", "vit_tiny_test", "--steps", "1", "--batch", "4",
        "--dp", "2", "--pp", "2", "--tp", "2", "--ops", "xla",
        "--no-compile-cache",
    ])
    assert rc == 2
    assert "fused_train" in capsys.readouterr().err


def test_cli_golden_compare_detects_mismatch(
    tiny_checkpoint, tiny_cfg, capsys, monkeypatch
):
    import vit_tpu.config as config_mod

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    golden = tiny_checkpoint / "golden.txt"
    C.write_result_file([0, 1, 2, 3], [0.9, 0.9, 0.9, 0.9], golden)  # wrong labels
    rc = _run([
        "--config", "vit_tiny_test", "--weights", tiny_checkpoint / "Network",
        "--input", tiny_checkpoint / "input.bin",
        "--dtype", "float32", "--ops", "xla", "--batch-pad", "4",
        "--golden", golden,
    ])
    assert rc == 1


def test_wd_exempt_norm_bias_mask(tiny_cfg):
    """--wd-exempt-norm-bias: zero grads still decay GEMM kernels (adamw
    weight decay) but leave norms/biases/embeddings untouched."""
    import jax
    import jax.numpy as jnp
    import optax

    from vit_tpu.cli.train_args import build_parser
    from vit_tpu.cli.train_setup import _build_optimizer, decay_mask
    from vit_tpu.models.vit import init_params

    args = build_parser().parse_args(
        ["--wd-exempt-norm-bias", "--weight-decay", "0.1"]
    )
    opt = _build_optimizer(args, 1e-2)
    params = init_params(jax.random.key(0), tiny_cfg)
    state = opt.init(params)
    zero = jax.tree.map(jnp.zeros_like, params)
    updates, _ = opt.update(zero, state, params)
    new = optax.apply_updates(params, updates)
    mask = decay_mask(params)
    flat_new = jax.tree_util.tree_flatten_with_path(new)[0]
    flat_old = {tuple(p): v for p, v in
                jax.tree_util.tree_flatten_with_path(params)[0]}
    flat_mask = {tuple(p): v for p, v in
                 jax.tree_util.tree_flatten_with_path(mask)[0]}
    checked_decay = checked_exempt = 0
    for path, v in flat_new:
        old = flat_old[tuple(path)]
        if flat_mask[tuple(path)]:
            assert not np.allclose(np.asarray(v), np.asarray(old)), path
            checked_decay += 1
        else:
            np.testing.assert_array_equal(np.asarray(v), np.asarray(old))
            checked_exempt += 1
    assert checked_decay >= 6 and checked_exempt >= 10


def test_wd_exempt_rejects_fused_adamw(tiny_cfg, monkeypatch, capsys):
    import vit_tpu.config as config_mod
    from vit_tpu.cli.train import main as train_main

    monkeypatch.setitem(config_mod.CONFIGS, tiny_cfg.name, tiny_cfg)
    rc = train_main([
        "--config", tiny_cfg.name, "--steps", "1", "--batch", "8",
        "--ops", "fused_train", "--optimizer", "fused_adamw",
        "--wd-exempt-norm-bias", "--no-compile-cache",
    ])
    assert rc == 2
    assert "wd-exempt-norm-bias" in capsys.readouterr().err


def test_resolve_mesh_floors_to_tp_multiple():
    """--tp without --dp floors the device count to a tp multiple (the
    behavior main/serve always had; eval's copy used to crash on --tp 3
    over 8 devices — now all three share cli/common.resolve_mesh)."""
    import io

    from vit_tpu.cli.common import resolve_mesh

    out = io.StringIO()
    mesh = resolve_mesh(0, 3, out=out)
    assert dict(mesh.shape) == {"dp": 2, "tp": 3}  # 6 of 8 devices
    assert resolve_mesh(0, 1) is None  # single-device default


def test_cast_params_preserves_integer_leaves(tiny_params):
    """cast_params must not corrupt a quantized pytree's int8 weights."""
    import jax.numpy as jnp

    from vit_tpu.models.vit import cast_params
    from vit_tpu.ops.quant import quantize_params

    q = quantize_params(tiny_params)
    c = cast_params(q, jnp.bfloat16)
    assert c["blocks"]["wqkv"].dtype == jnp.int8  # untouched
    assert c["pos_embed"].dtype == jnp.bfloat16
