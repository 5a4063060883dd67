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
