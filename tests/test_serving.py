"""HTTP synthesis service tests: end-to-end over a real socket, with
micro-batching under concurrent clients."""
import concurrent.futures
import json
import urllib.request

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ctagan_tpu.data.dicom import make_ct_slice, read_dicom, write_dicom
from ctagan_tpu.data.fixtures import synthetic_ct_pixels
from ctagan_tpu.models import Generator
from ctagan_tpu.serving.server import serve_async


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    g = Generator(1, 1)
    params = g.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))
    srv, service, port = serve_async(g, params, size=32, max_batch=4)
    yield port
    service.stop()
    srv.shutdown()


def _dicom_bytes(tmp_path, seed=0):
    rng = np.random.default_rng(seed)
    ds = make_ct_slice(synthetic_ct_pixels(rng, 32))
    p = tmp_path / f"s{seed}"
    write_dicom(ds, p)
    return p.read_bytes()


def test_healthz(server):
    with urllib.request.urlopen(f"http://127.0.0.1:{server}/healthz") as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"
    assert body["max_batch"] == 4


def test_synthesize_roundtrip(server, tmp_path):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server}/synthesize",
        data=_dicom_bytes(tmp_path),
        method="POST",
    )
    with urllib.request.urlopen(req) as r:
        out = r.read()
    ds = read_dicom(out)
    assert ds.pixel_array().shape == (32, 32)
    # tanh output -> stored values within [0, 4095]
    px = ds.pixel_array().astype(np.int64)
    assert px.min() >= 0 and px.max() <= 4095


def test_concurrent_requests_microbatch(server, tmp_path):
    def one(i):
        req = urllib.request.Request(
            f"http://127.0.0.1:{server}/synthesize",
            data=_dicom_bytes(tmp_path, seed=i),
            method="POST",
        )
        with urllib.request.urlopen(req) as r:
            return read_dicom(r.read()).pixel_array().shape

    with concurrent.futures.ThreadPoolExecutor(8) as ex:
        shapes = list(ex.map(one, range(8)))
    assert shapes == [(32, 32)] * 8


def test_malformed_body_clean_400(server):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server}/synthesize", data=b"not a dicom", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req)
    assert ei.value.code == 400


def test_unknown_path_404(server):
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(f"http://127.0.0.1:{server}/nope")
    assert ei.value.code == 404


class _ScaleModel:
    """Stand-in 'model' so the pipelining test checks request->result
    mapping exactly (output = input * k)."""

    def apply(self, params, x):
        return x * params["k"]


def test_pipelined_dispatch_preserves_request_mapping():
    from ctagan_tpu.serving.server import SynthesisService

    svc = SynthesisService(
        _ScaleModel(), {"k": 2.0}, size=8, max_batch=2,
        batch_timeout_ms=2.0, pipeline_depth=3,
    )
    try:
        rng = np.random.default_rng(0)
        images = [rng.uniform(-1, 1, (8, 8)).astype(np.float32) for _ in range(16)]
        with concurrent.futures.ThreadPoolExecutor(16) as ex:
            outs = list(ex.map(svc.synthesize, images))
        for img, out in zip(images, outs):
            np.testing.assert_allclose(out, img * 2.0, rtol=1e-6)
        assert svc.stats()["pipeline_depth"] == 3
    finally:
        svc.stop()


# ---------------------------------------------------------------------------
# 2.5-D models (channels = context_slices > 1): per-series streaming ring
# ---------------------------------------------------------------------------

def _service3(max_batch=4):
    from ctagan_tpu.serving.server import SynthesisService

    g = Generator(3, 1)
    params = g.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)))
    return g, params, SynthesisService(
        g, params, size=32, max_batch=max_batch, channels=3
    )


def test_context_streaming_matches_training_context():
    """Streaming a series through the ring must reproduce the training-time
    centered, edge-clamped context (datasets.py::_load_context) exactly."""
    import time

    g, params, service = _service3()
    try:
        rng = np.random.default_rng(0)
        slices = [
            rng.uniform(-1, 1, (32, 32)).astype(np.float32) for _ in range(5)
        ]
        with concurrent.futures.ThreadPoolExecutor(5) as ex:
            futs = []
            for i, s in enumerate(slices):
                futs.append(
                    ex.submit(
                        service.synthesize, s, 30.0, "series-1", i == 4
                    )
                )
                time.sleep(0.1)  # keep per-series arrival order
            outs = [f.result() for f in futs]
        fwd = jax.jit(lambda p, x: g.apply(p, x))
        for i in range(5):
            ctx = np.stack(
                [slices[min(max(i + o, 0), 4)] for o in (-1, 0, 1)], -1
            )
            exp = np.asarray(fwd(params, ctx[None]))[0, :, :, 0]
            np.testing.assert_allclose(outs[i], exp, rtol=1e-3, atol=1e-3)
    finally:
        service.stop()


def test_context_stateless_single_slice():
    """No series key -> the slice is its own length-1 series (context =
    C clamp-replicated copies), answered immediately."""
    g, params, service = _service3()
    try:
        rng = np.random.default_rng(1)
        s = rng.uniform(-1, 1, (32, 32)).astype(np.float32)
        out = service.synthesize(s, timeout=30.0)
        fwd = jax.jit(lambda p, x: g.apply(p, x))
        exp = np.asarray(
            fwd(params, np.repeat(s[..., None], 3, -1)[None])
        )[0, :, :, 0]
        np.testing.assert_allclose(out, exp, rtol=1e-3, atol=1e-3)
    finally:
        service.stop()


def test_context_http_streaming(tmp_path):
    """End-to-end over the socket: pipelined client streams a 4-slice
    series to a context_slices=3 model (VERDICT r2 #9 done-criterion)."""
    import time

    g = Generator(3, 1)
    params = g.init(jax.random.PRNGKey(2), jnp.zeros((1, 32, 32, 3)))
    srv, service, port = serve_async(
        g, params, size=32, max_batch=4, channels=3
    )
    try:
        def one(i, last):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/synthesize",
                data=_dicom_bytes(tmp_path, seed=i),
                method="POST",
                headers={
                    "X-Series-UID": "1.2.3.4",
                    "X-Last-Slice": "1" if last else "0",
                },
            )
            with urllib.request.urlopen(req, timeout=60) as r:
                return read_dicom(r.read()).pixel_array().shape

        with concurrent.futures.ThreadPoolExecutor(4) as ex:
            futs = []
            for i in range(4):
                futs.append(ex.submit(one, i, i == 3))
                time.sleep(0.1)
            shapes = [f.result() for f in futs]
        assert shapes == [(32, 32)] * 4

        # stateless escape hatch for non-streaming clients
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/synthesize",
            data=_dicom_bytes(tmp_path, seed=9),
            method="POST",
            headers={"X-Single-Slice": "1"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            assert read_dicom(r.read()).pixel_array().shape == (32, 32)
    finally:
        service.stop()
        srv.shutdown()
