"""Dynamic-batching inference server tests (runtime/serving.py + serve CLI).

The reference has no serving story (one-shot Main.c loop); correctness bar
here: coalesced variable-size concurrent requests return exactly what the
engine returns for each request alone.
"""

import threading
import time

import numpy as np
import pytest

from vit_tpu.io import images as iio
from vit_tpu.runtime import InferenceEngine
from vit_tpu.runtime.serving import InferenceServer, measure_throughput


@pytest.fixture(scope="module")
def engine(tiny_cfg, tiny_params):
    return InferenceEngine(tiny_cfg, tiny_params, dtype="float32", batch_pad=8)


def test_variable_size_requests_match_direct_engine(engine, tiny_cfg):
    reqs = [iio.synth_images(n, tiny_cfg, seed=10 + n) for n in (1, 3, 2, 5, 4)]
    with InferenceServer(engine, max_batch=8, max_delay_ms=20.0) as srv:
        futures = [srv.submit(r, return_probs=(i % 2 == 0))
                   for i, r in enumerate(reqs)]
        results = [f.result(timeout=60) for f in futures]
    for i, (r, (labels, top, probs)) in enumerate(zip(reqs, results)):
        want_labels, want_top = engine.classify(r)
        np.testing.assert_array_equal(labels, want_labels)
        np.testing.assert_allclose(top, want_top, atol=1e-6)
        if i % 2 == 0:  # probs only ship when asked for
            assert probs.shape == (len(r), tiny_cfg.num_classes)
        else:
            assert probs is None


def test_requests_coalesce_into_batches(engine, tiny_cfg):
    # 6 single-image requests submitted together with a generous delay
    # window must run in fewer batches than requests.
    reqs = [iio.synth_images(1, tiny_cfg, seed=i) for i in range(6)]
    with InferenceServer(engine, max_batch=8, max_delay_ms=200.0) as srv:
        srv.classify(reqs[0])  # warm-up batch
        futures = [srv.submit(r) for r in reqs]
        for f in futures:
            f.result(timeout=60)
        assert srv.stats.batches < 1 + len(reqs)
        assert srv.stats.images == 1 + len(reqs)


def test_concurrent_submitters(engine, tiny_cfg):
    errs = []

    def worker(seed):
        try:
            imgs = iio.synth_images(2, tiny_cfg, seed=seed)
            labels, top, _ = srv.classify(imgs, timeout=60)
            want, _ = engine.classify(imgs)
            np.testing.assert_array_equal(labels, want)
        except Exception as e:  # surface into the main thread
            errs.append(e)

    with InferenceServer(engine, max_batch=4, max_delay_ms=5.0) as srv:
        threads = [threading.Thread(target=worker, args=(s,)) for s in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    assert not errs


def test_submit_validates_shape(engine):
    with InferenceServer(engine) as srv:
        with pytest.raises(ValueError):
            srv.submit(np.zeros((3, 3)))
    with pytest.raises(RuntimeError):
        srv.submit(np.zeros((1, 3, 32, 32)))  # stopped server


def test_submit_rejects_wrong_image_dims(engine, tiny_cfg):
    """A malformed-dimension request must fail ITSELF with a ValueError
    (-> HTTP 400), not coalesce into a batch and 500 every innocent
    request dispatched alongside it."""
    s = tiny_cfg.image_size
    with InferenceServer(engine) as srv:
        with pytest.raises(ValueError, match="expected images of shape"):
            srv.submit(np.zeros((1, 3, s // 2, s // 2), np.float32))
        with pytest.raises(ValueError, match="expected images of shape"):
            srv.submit(np.zeros((1, 1, s, s), np.float32))
        # a valid request straight after still serves fine
        fut = srv.submit(np.zeros((1, 3, s, s), np.float32))
        labels, _, _ = fut.result(timeout=60)
        assert len(labels) == 1


def test_measure_throughput_runs(engine, tiny_cfg):
    with InferenceServer(engine, max_batch=8, max_delay_ms=1.0) as srv:
        rate, total = measure_throughput(srv, [1, 2, 3, 4], tiny_cfg)
    assert rate > 0 and total == 10


def test_serve_cli_selftest(tiny_cfg, tmp_path, monkeypatch, capsys):
    import json

    import vit_tpu.config as config_mod
    from vit_tpu.cli.serve import main as serve_main
    from vit_tpu.io import weights as wio

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    wio.save_reference_weights(
        wio.synth_reference_tensors(tiny_cfg, seed=1), tmp_path / "Network", tiny_cfg
    )
    rc = serve_main([
        "--config", "vit_tiny_test", "--weights", str(tmp_path / "Network"),
        "--dtype", "float32", "--selftest", "5", "--max-batch", "8",
        "--batch-pad", "8", "--no-compile-cache",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["value"] > 0 and out["requests"] == 5


def test_serve_http_endpoint(tiny_cfg, tiny_params, tmp_path, monkeypatch):
    """Full HTTP round-trip on an ephemeral port: wire format in, JSON out."""
    import http.client
    import json
    import time

    import vit_tpu.config as config_mod
    from vit_tpu.cli import serve as serve_mod
    from vit_tpu.io import weights as wio

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    wio.save_reference_weights(
        wio.synth_reference_tensors(tiny_cfg, seed=1), tmp_path / "Network", tiny_cfg
    )
    args = serve_mod.build_parser().parse_args([
        "--config", "vit_tiny_test", "--weights", str(tmp_path / "Network"),
        "--dtype", "float32", "--port", "0", "--batch-pad", "8",
        "--no-compile-cache",
    ])
    cfg, ops, server = serve_mod._build_server(args)

    # Run the daemon in a thread; capture the httpd instance to learn the
    # bound ephemeral port and to shut it down cleanly.
    import http.server as hs
    import threading as th

    bound = {}
    orig_init = hs.ThreadingHTTPServer.__init__

    def capture_init(self, *a, **k):
        orig_init(self, *a, **k)
        bound["httpd"] = self

    monkeypatch.setattr(hs.ThreadingHTTPServer, "__init__", capture_init)
    t = th.Thread(
        target=lambda: serve_mod._http_daemon(args, cfg, ops, server),
        daemon=True,
    )
    t.start()
    for _ in range(1200):  # startup includes the padded-size jit warmup
        if "httpd" in bound:
            break
        time.sleep(0.05)
    port = bound["httpd"].server_address[1]

    images = iio.synth_images(3, tiny_cfg, seed=5)
    header = np.array(images.shape, dtype="<i4").tobytes()
    body = header + np.asarray(images, dtype="<f4").tobytes()

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("POST", "/classify", body=body)
    resp = json.loads(conn.getresponse().read())
    assert len(resp["results"]) == 3
    eng = InferenceEngine(tiny_cfg, tiny_params, dtype="float32", batch_pad=8)
    want, _ = eng.classify(images)
    assert [r["label"] for r in resp["results"]] == [int(x) for x in want]
    assert all(isinstance(r["name"], str) for r in resp["results"])

    # raw image upload: Content-Type image/* routes through the
    # torchvision eval preprocessing (io/preprocess.py)
    try:
        from PIL import Image
    except ImportError:
        Image = None
    if Image is not None:
        import io as _io

        buf = _io.BytesIO()
        rgb = (np.random.default_rng(9).random((48, 48, 3)) * 255).astype(
            np.uint8
        )
        Image.fromarray(rgb).save(buf, format="PNG")
        conn.request(
            "POST", "/classify", body=buf.getvalue(),
            headers={"Content-Type": "image/png"},
        )
        raw_resp = json.loads(conn.getresponse().read())
        assert len(raw_resp["results"]) == 1
        assert isinstance(raw_resp["results"][0]["name"], str)

        # garbage image body is a CLIENT error (400), not a 500
        conn.request(
            "POST", "/classify", body=b"not an image at all",
            headers={"Content-Type": "image/jpeg"},
        )
        bad = conn.getresponse()
        assert bad.status == 400, bad.status
        assert "undecodable" in json.loads(bad.read())["error"]

    conn.request("GET", "/healthz")
    health = json.loads(conn.getresponse().read())
    assert health["ok"] and health["images"] >= 3
    assert "latency_p50_ms" in health and "latency_p99_ms" in health

    conn.request("GET", "/metrics")
    metrics = conn.getresponse().read().decode()
    assert "vit_tpu_requests_total" in metrics
    assert "vit_tpu_images_per_batch" in metrics
    # latency SLOs: full histogram + p50/p99 gauges + deadline counter
    assert 'vit_tpu_request_latency_seconds_bucket{le="+Inf"}' in metrics
    assert "vit_tpu_request_latency_seconds_count" in metrics
    assert "vit_tpu_request_latency_p50_seconds" in metrics
    assert "vit_tpu_request_latency_p99_seconds" in metrics
    assert "vit_tpu_deadline_expired_total 0" in metrics

    # a request with an already-expired queueing deadline maps to 504
    conn.request("POST", "/classify", body=body,
                 headers={"X-Deadline-Ms": "0"})
    gone = conn.getresponse()
    assert gone.status == 504, gone.status
    assert "deadline" in json.loads(gone.read())["error"]

    # malformed deadlines are CLIENT errors (400), never phantom 504s:
    # nan would compare false against every deadline, inf would silently
    # disable the SLO
    # an empty value (templated client with an unset variable) is the
    # same class — a silently disabled SLO is never acceptable
    for bad in ("nan", "inf", "-5", "soon", ""):
        conn.request("POST", "/classify", body=body,
                     headers={"X-Deadline-Ms": bad})
        resp = conn.getresponse()
        assert resp.status == 400, (bad, resp.status)
        assert "X-Deadline-Ms" in json.loads(resp.read())["error"]

    # /reload is opt-in: without --allow-reload it must refuse (403)
    conn.request("POST", "/reload",
                 body=json.dumps({"weights": str(tmp_path / "Network")}))
    refused = conn.getresponse()
    assert refused.status == 403, refused.status
    assert "--allow-reload" in json.loads(refused.read())["error"]

    bound["httpd"].shutdown()
    t.join(timeout=10)
    assert not t.is_alive()


def test_dispatch_failure_releases_backlog_and_server_survives(
    tiny_cfg, tiny_params
):
    """A request that fails INSIDE dispatch (wrong image size passes
    submit's shape check) must release its backlog accounting and leave
    the server serving — a leak would eventually shed all traffic."""
    from vit_tpu.runtime.serving import InferenceServer

    eng = InferenceEngine(tiny_cfg, tiny_params, dtype="float32",
                          batch_pad=4)
    with InferenceServer(eng, max_batch=4, max_delay_ms=1.0,
                         max_queue_images=8) as srv:
        bad = np.zeros((2, 3, 8, 8), np.float32)  # wrong H/W for the model
        with pytest.raises(Exception):
            srv.classify(bad, timeout=30)
        good = np.zeros(
            (2, 3, tiny_cfg.image_size, tiny_cfg.image_size), np.float32
        )
        labels, top, _ = srv.classify(good, timeout=30)
        assert len(labels) == 2
    assert srv._pending == 0  # the failed batch released its accounting


def test_cancelled_future_does_not_wedge_server(tiny_cfg, tiny_params):
    """A client cancelling its Future must not kill the completer thread
    (InvalidStateError on set_result) — later requests still resolve."""
    from vit_tpu.runtime.serving import InferenceServer

    eng = InferenceEngine(tiny_cfg, tiny_params, dtype="float32",
                          batch_pad=4)
    imgs = np.zeros(
        (2, 3, tiny_cfg.image_size, tiny_cfg.image_size), np.float32
    )
    with InferenceServer(eng, max_batch=4, max_delay_ms=1.0,
                         max_queue_images=64) as srv:
        for _ in range(5):
            srv.submit(imgs).cancel()  # races dispatch; either state is fine
        labels, top, _ = srv.classify(imgs, timeout=30)
        assert len(labels) == 2
    assert srv._pending == 0


def test_submit_rejects_oversize_request(tiny_cfg, tiny_params):
    """A request larger than max_batch is a client error (it would compile
    a fresh padded size), not something to silently dispatch."""
    from vit_tpu.runtime.serving import InferenceServer

    eng = InferenceEngine(tiny_cfg, tiny_params, dtype="float32",
                          batch_pad=4)
    srv = InferenceServer(eng, max_batch=4)
    srv._running = True
    try:
        with pytest.raises(ValueError, match="exceeds max_batch"):
            srv.submit(np.zeros(
                (5, 3, tiny_cfg.image_size, tiny_cfg.image_size), np.float32
            ))
    finally:
        srv._running = False


def test_submit_sheds_load_past_max_queue(tiny_cfg, tiny_params):
    """Backpressure: submit raises ServerOverloadedError once the pending
    image count would exceed max_queue_images (bounded backlog instead of
    unbounded queue growth under overload)."""
    from vit_tpu.runtime.serving import (
        InferenceServer,
        ServerOverloadedError,
    )

    eng = InferenceEngine(tiny_cfg, tiny_params, dtype="float32",
                          batch_pad=4)
    srv = InferenceServer(eng, max_batch=4, max_queue_images=6)
    srv._running = True  # white-box: no dispatcher, so nothing drains
    try:
        imgs = np.zeros(
            (4, 3, tiny_cfg.image_size, tiny_cfg.image_size), np.float32
        )
        srv.submit(imgs)  # pending 4 <= 6
        with pytest.raises(ServerOverloadedError, match="backlog 4"):
            srv.submit(imgs)  # 4 + 4 > 6
        srv.submit(imgs[:2])  # exactly at the cap is allowed
    finally:
        srv._running = False


def test_submit_after_stop_raises_not_hangs(tiny_cfg, tiny_params):
    """submit() on a stopped server must fail fast (RuntimeError), never
    enqueue behind _STOP where no dispatcher will ever resolve the Future
    — the running-check and enqueue are atomic vs stop()."""
    from vit_tpu.runtime.serving import InferenceServer

    eng = InferenceEngine(tiny_cfg, tiny_params, dtype="float32",
                          batch_pad=4)
    srv = InferenceServer(eng, max_batch=4)
    srv.start()
    imgs = np.zeros(
        (2, 3, tiny_cfg.image_size, tiny_cfg.image_size), np.float32
    )
    srv.classify(imgs, timeout=120)
    srv.stop()
    with pytest.raises(RuntimeError, match="not started"):
        srv.submit(imgs)
    assert srv._q.empty()  # nothing stranded behind _STOP
    assert srv._pending == 0


def test_measure_throughput_restores_queue_cap(tiny_cfg, tiny_params):
    """The whole-stream-at-t0 helper suspends load-shedding for its own
    burst and restores the configured cap afterwards."""
    from vit_tpu.runtime import serving as S

    eng = InferenceEngine(tiny_cfg, tiny_params, dtype="float32",
                          batch_pad=4)
    srv = S.InferenceServer(eng, max_batch=4, max_queue_images=4)
    srv.start()
    try:
        # 3 requests x 4 images > the 4-image cap: would shed mid-submit
        # if the helper didn't lift it
        ips, total = S.measure_throughput(srv, [4, 4, 4], tiny_cfg)
        assert total == 12 and ips > 0
        assert srv.max_queue_images == 4  # restored
    finally:
        srv.stop()


def test_serve_cli_selftest_multihost(tiny_cfg, tmp_path, monkeypatch, capsys):
    """--multihost lockstep mode, single process: distributed.initialize
    degrades to a no-op and the LockstepServer serves over the global
    (8-virtual-device) dp mesh."""
    import json

    import jax

    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    import vit_tpu.config as config_mod
    from vit_tpu.cli.serve import main as serve_main
    from vit_tpu.io import weights as wio

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    wio.save_reference_weights(
        wio.synth_reference_tensors(tiny_cfg, seed=1), tmp_path / "Network", tiny_cfg
    )
    rc = serve_main([
        "--config", "vit_tiny_test", "--weights", str(tmp_path / "Network"),
        "--dtype", "float32", "--selftest", "4", "--multihost",
        "--local-batch", "8", "--no-compile-cache",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "multihost: 1 host(s), global dp=" in out
    res = json.loads(out.strip().splitlines()[-1])
    assert res["value"] > 0 and res["requests"] == 4


def test_serve_cli_selftest_mesh(tiny_cfg, tmp_path, monkeypatch, capsys):
    """Serving over a dp x tp mesh (engine shard_map TP under the daemon)."""
    import json

    import jax

    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    import vit_tpu.config as config_mod
    from vit_tpu.cli.serve import main as serve_main
    from vit_tpu.io import weights as wio

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    wio.save_reference_weights(
        wio.synth_reference_tensors(tiny_cfg, seed=1), tmp_path / "Network", tiny_cfg
    )
    rc = serve_main([
        "--config", "vit_tiny_test", "--weights", str(tmp_path / "Network"),
        "--dtype", "float32", "--ops", "fused", "--selftest", "3",
        "--max-batch", "8", "--batch-pad", "4", "--dp", "2", "--tp", "2",
        "--no-compile-cache",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "mesh: {'dp': 2, 'tp': 2}" in out
    assert json.loads(out.strip().splitlines()[-1])["value"] > 0


def test_latency_histogram_quantiles():
    from vit_tpu.runtime.serving import LatencyHistogram

    h = LatencyHistogram()
    assert h.quantile(0.5) == 0.0  # empty
    for ms in [2, 2, 2, 2, 2, 2, 2, 2, 2, 400]:
        h.record(ms / 1e3)
    cum, total_sum, count = h.snapshot()
    assert count == 10 and cum[-1] == 10
    assert abs(total_sum - 0.418) < 1e-6
    p50 = h.quantile(0.5)
    assert 0.001 <= p50 <= 0.0025  # inside the 2ms bucket
    p99 = h.quantile(0.99)
    assert 0.25 <= p99 <= 0.5  # inside the 400ms bucket


def test_request_latency_recorded(engine, tiny_cfg):
    with InferenceServer(engine, max_batch=8, max_delay_ms=5.0) as srv:
        srv.classify(iio.synth_images(2, tiny_cfg, seed=0))
        srv.classify(iio.synth_images(1, tiny_cfg, seed=1))
    assert srv.stats.latency.count == 2
    assert srv.stats.latency.quantile(0.5) > 0.0


def test_stats_recorded_before_future_resolves(engine, tiny_cfg):
    """The selftest pattern swaps ``server.stats`` the instant classify()
    returns.  The completer must therefore record the WHOLE batch's stats
    before resolving any future — otherwise warmup samples leak into the
    supposedly warmup-free SLO window.  The callback below runs inside the
    completer thread at the exact resolve point, deterministically
    reproducing the race."""
    from vit_tpu.runtime.serving import ServerStats

    with InferenceServer(engine, max_batch=8, max_delay_ms=1.0) as srv:
        old = {}

        def swap(_fut):  # executes in the completer thread, mid-_resolve
            old["stats"] = srv.stats
            srv.stats = ServerStats()

        fut = srv.submit(iio.synth_images(2, tiny_cfg, seed=3))
        fut.add_done_callback(swap)
        fut.result(timeout=60)
        time.sleep(0.2)  # let the completer finish the batch entirely
        assert old["stats"].requests == 1
        assert old["stats"].images == 2
        assert old["stats"].batches == 1
        assert old["stats"].latency.count == 1
        fresh = srv.stats
        assert fresh.requests == 0 and fresh.images == 0
        assert fresh.latency.count == 0  # no leak into the new window


def test_measure_steady_state_paces_and_isolates_slo_window(engine, tiny_cfg):
    """Paced (Poisson-arrival) measurement: achieves the offered stream,
    reports offered load, and its SLO window excludes warmup traffic."""
    from vit_tpu.runtime.serving import measure_steady_state

    sizes = [1, 2, 3, 2]
    with InferenceServer(engine, max_batch=8, max_delay_ms=1.0) as srv:
        rate, total, offered = measure_steady_state(
            srv, sizes, tiny_cfg, rate_rps=200.0
        )
        with pytest.raises(ValueError):
            measure_steady_state(srv, sizes, tiny_cfg, rate_rps=0.0)
    assert rate > 0 and total == sum(sizes) and offered > 0
    # stats were reset after warmup: exactly the paced requests remain
    assert srv.stats.requests == len(sizes)
    assert srv.stats.latency.count == len(sizes)


def test_measure_steady_state_above_capacity_degrades_not_raises(engine, tiny_cfg):
    """Offered load above capacity must degenerate to the saturation
    measurement (the documented behavior), not crash with
    ServerOverloadedError once the backlog crosses max_queue_images —
    the measurement suspends load-shedding like measure_throughput."""
    from vit_tpu.runtime.serving import measure_steady_state

    sizes = [1] * 12
    with InferenceServer(
        engine, max_batch=4, max_delay_ms=1.0, max_queue_images=2
    ) as srv:
        rate, total, offered = measure_steady_state(
            srv, sizes, tiny_cfg, rate_rps=1e6  # instant burst >> capacity
        )
        assert rate > 0 and total == len(sizes)
        assert srv.max_queue_images == 2  # restored after the run


def test_serve_cli_selftest_paced(tiny_cfg, tmp_path, monkeypatch, capsys):
    import json

    import vit_tpu.config as config_mod
    from vit_tpu.cli.serve import main as serve_main
    from vit_tpu.io import weights as wio

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    wio.save_reference_weights(
        wio.synth_reference_tensors(tiny_cfg, seed=1), tmp_path / "Network", tiny_cfg
    )
    rc = serve_main([
        "--config", "vit_tiny_test", "--weights", str(tmp_path / "Network"),
        "--dtype", "float32", "--selftest", "5", "--selftest-rate", "100",
        "--max-batch", "8", "--batch-pad", "8", "--no-compile-cache",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["value"] > 0 and out["mode"] == "steady"
    assert out["offered_rps"] > 0
    assert out["latency_p99_ms"] > 0


def test_sigterm_handler_drains_daemon(engine, tiny_cfg):
    """The SIGTERM handler stops the HTTP listener; accepted requests then
    resolve through the server's normal FIFO drain (stop())."""
    import signal
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from vit_tpu.cli.serve import _drain_on_sigterm

    class Quiet(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):
            pass

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), Quiet)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    restore = _drain_on_sigterm(httpd)
    try:
        with InferenceServer(engine, max_batch=8, max_delay_ms=1.0) as srv:
            fut = srv.submit(iio.synth_images(2, tiny_cfg, seed=7))
            handler = signal.getsignal(signal.SIGTERM)
            handler(signal.SIGTERM, None)  # as the OS would deliver it
            t.join(timeout=30)
            assert not t.is_alive()  # listener stopped...
            labels, _, _ = fut.result(timeout=60)  # ...but work drained
            assert labels.shape == (2,)
        # exiting the with-block ran the same stop() path the daemon uses
    finally:
        restore()
        httpd.server_close()
    assert signal.getsignal(signal.SIGTERM) != handler  # restored


def test_queued_request_past_deadline_fails_504_class(engine, tiny_cfg):
    """A request whose submit deadline passes while still QUEUED must fail
    with DeadlineExceededError (the serve CLI maps it to HTTP 504); work
    already dispatched is never cancelled."""
    from vit_tpu.runtime.serving import DeadlineExceededError

    imgs = iio.synth_images(1, tiny_cfg, seed=3)
    with InferenceServer(engine, max_batch=8, max_delay_ms=1.0) as srv:
        srv.classify(imgs)  # warm
        # deadline_ms=0: already expired by the time the dispatcher pulls it
        fut = srv.submit(imgs, deadline_ms=0.0)
        with pytest.raises(DeadlineExceededError):
            fut.result(timeout=60)
        # the backlog slot was released and the server still serves
        labels, _, _ = srv.classify(imgs, timeout=60)
        assert labels.shape == (1,)
    assert srv.stats.deadline_expired == 1




def test_server_swap_params_hot_reload(tiny_cfg, tiny_params):
    """Zero-downtime reload through the server: no drain, no restart —
    requests after swap_params serve the new checkpoint exactly."""
    from vit_tpu.io import weights as wio

    new_params = wio.params_from_tensors(
        wio.synth_reference_tensors(tiny_cfg, seed=7), tiny_cfg
    )
    engine = InferenceEngine(tiny_cfg, tiny_params, dtype="float32", batch_pad=8)
    fresh = InferenceEngine(tiny_cfg, new_params, dtype="float32", batch_pad=8)
    imgs = iio.synth_images(3, tiny_cfg, seed=11)
    want_old = engine.classify(imgs)
    want_new = fresh.classify(imgs)
    with InferenceServer(engine, max_batch=8, max_delay_ms=2.0) as srv:
        l0, t0, _ = srv.classify(imgs)
        np.testing.assert_array_equal(l0, want_old[0])
        srv.swap_params(new_params)
        l1, t1, _ = srv.classify(imgs)
        np.testing.assert_array_equal(l1, want_new[0])
        np.testing.assert_allclose(t1, want_new[1], atol=1e-6)
        # stats/queueing machinery untouched by the swap
        assert srv.stats.requests == 2


def test_serve_http_reload_endpoint(tiny_cfg, tmp_path, monkeypatch):
    """POST /reload with --allow-reload hot-swaps to the new checkpoint;
    bad paths are client errors and leave the old weights serving."""
    import http.client
    import json
    import time

    import vit_tpu.config as config_mod
    from vit_tpu.cli import serve as serve_mod
    from vit_tpu.io import weights as wio

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    for seed, name in ((1, "NetA"), (7, "NetB")):
        wio.save_reference_weights(
            wio.synth_reference_tensors(tiny_cfg, seed=seed),
            tmp_path / name, tiny_cfg,
        )
    args = serve_mod.build_parser().parse_args([
        "--config", "vit_tiny_test", "--weights", str(tmp_path / "NetA"),
        "--dtype", "float32", "--port", "0", "--batch-pad", "8",
        "--no-compile-cache", "--allow-reload",
    ])
    cfg, ops, server = serve_mod._build_server(args)

    import http.server as hs
    import threading as th

    bound = {}
    orig_init = hs.ThreadingHTTPServer.__init__

    def capture_init(self, *a, **k):
        orig_init(self, *a, **k)
        bound["httpd"] = self

    monkeypatch.setattr(hs.ThreadingHTTPServer, "__init__", capture_init)
    t = th.Thread(
        target=lambda: serve_mod._http_daemon(args, cfg, ops, server),
        daemon=True,
    )
    t.start()
    for _ in range(1200):
        if "httpd" in bound:
            break
        time.sleep(0.05)
    port = bound["httpd"].server_address[1]

    imgs = iio.synth_images(2, tiny_cfg, seed=13)
    header = np.array(imgs.shape, dtype="<i4").tobytes()
    body = header + np.asarray(imgs, dtype="<f4").tobytes()

    def classify_labels(conn):
        conn.request("POST", "/classify", body=body)
        return [r["label"] for r in json.loads(conn.getresponse().read())["results"]]

    pa = wio.params_from_tensors(wio.synth_reference_tensors(tiny_cfg, 1), tiny_cfg)
    pb = wio.params_from_tensors(wio.synth_reference_tensors(tiny_cfg, 7), tiny_cfg)
    want_a = InferenceEngine(tiny_cfg, pa, dtype="float32", batch_pad=8).classify(imgs)[0]
    want_b = InferenceEngine(tiny_cfg, pb, dtype="float32", batch_pad=8).classify(imgs)[0]

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    assert classify_labels(conn) == [int(x) for x in want_a]

    conn.request("POST", "/reload",
                 body=json.dumps({"weights": str(tmp_path / "NetB")}))
    ok = conn.getresponse()
    assert ok.status == 200, ok.status
    assert json.loads(ok.read())["ok"] is True
    assert classify_labels(conn) == [int(x) for x in want_b]

    # bad path -> 400, old (well, B) weights keep serving
    conn.request("POST", "/reload",
                 body=json.dumps({"weights": str(tmp_path / "Nope")}))
    bad = conn.getresponse()
    assert bad.status == 400, bad.status
    bad.read()
    # malformed body -> 400
    conn.request("POST", "/reload", body=b"{}")
    bad2 = conn.getresponse()
    assert bad2.status == 400, bad2.status
    bad2.read()
    # valid JSON but not an object -> client error (400), not 500
    for shape_body in (b"null", b"[1]", b'"x"'):
        conn.request("POST", "/reload", body=shape_body)
        bad3 = conn.getresponse()
        assert bad3.status == 400, (shape_body, bad3.status)
        bad3.read()
    assert classify_labels(conn) == [int(x) for x in want_b]

    bound["httpd"].shutdown()
    t.join(timeout=10)
    assert not t.is_alive()
