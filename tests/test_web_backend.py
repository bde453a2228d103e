"""Browser-less e2e tests of the live web-demo backend: every endpoint of the
three apps (the reference Elm apps' Gradio API surface, reference
src/web/src/Semseg.elm:560-601, Classification.elm:585-712,
Comparison.elm:470-495) over HTTP against a real fake-backend run."""

import json
import pathlib
import urllib.error
import urllib.request

import numpy as np
import pytest

from saev_tpu import disk, nn
from saev_tpu.data import Metadata, OrderedConfig
from saev_tpu.framework import inference
from saev_tpu.nn import modeling

from conftest import _Helpers as helpers

pytestmark = pytest.mark.filterwarnings(
    "ignore::sklearn.exceptions.ConvergenceWarning"
)


def _build_run(tmp_path: pathlib.Path, *, seg: bool, name: str, seed: int = 0):
    """Seg shards + tiny trained-ish SAE + inference artifacts."""
    import jax

    from saev_tpu.data import fake_vit

    shards_dir = helpers.write_shards(
        tmp_path, n_examples=10, layers=(0,), seg=seg, batch_size=5
    )
    runs_root = helpers.tmp_runs_root(tmp_path)
    run = disk.Run.new(
        name, train_shards_dir=shards_dir, val_shards_dir=shards_dir,
        runs_root=runs_root,
    )
    cfg = modeling.SparseAutoencoderConfig(
        d_model=fake_vit.D_MODEL, d_sae=32, activation=modeling.TopK(top_k=4)
    )
    params, state = modeling.init(cfg, jax.random.key(seed))
    nn.dump(run.ckpt, cfg, params, state)
    inference.worker_fn(inference.Config(
        run=run.run_dir,
        data=OrderedConfig(shards=shards_dir, layer=0, batch_size=10),
        n_dists=2,
        device="cpu",
    ))
    return run, shards_dir


@pytest.fixture(scope="module")
def seg_server(tmp_path_factory):
    from saev_tpu.web import backend

    tmp = tmp_path_factory.mktemp("web_seg")
    run, shards_dir = _build_run(tmp, seg=True, name="websegrun")
    apps = {
        "semseg": backend.SemsegApp(run.run_dir, shards_dir, layer=0),
        "classification": backend.ClassificationApp(
            run.run_dir, shards_dir, layer=0
        ),
        "comparison": backend.ComparisonApp(
            [run.run_dir], [shards_dir], layer=0
        ),
    }
    server = backend.make_server(apps, port=0)
    backend.run_server(server)
    yield server
    server.shutdown()


def _call(server, app: str, endpoint: str, args: list):
    host, port = server.server_address
    req = urllib.request.Request(
        f"http://{host}:{port}/api/{app}/{endpoint}",
        data=json.dumps({"data": args}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        return json.loads(resp.read())["data"][0]


def _is_png(url: str) -> bool:
    return isinstance(url, str) and url.startswith("data:image/png;base64,")


def test_semseg_get_img(seg_server):
    out = _call(seg_server, "semseg", "get-img", [0])
    assert _is_png(out["orig_url"]) and _is_png(out["seg_url"])
    assert out["classes"] and all(isinstance(c, int) for c in out["classes"])


def test_semseg_orig_and_mod_preds_differ_by_intervention(seg_server):
    orig = _call(seg_server, "semseg", "get-orig-preds", [1])
    assert _is_png(orig["seg_url"]) and orig["classes"]
    # A null intervention reproduces the original prediction exactly.
    null = _call(seg_server, "semseg", "get-mod-preds", [1, {}])
    assert null["seg_url"] == orig["seg_url"]
    # A huge push along one latent's decoder row must change the prediction.
    mod = _call(seg_server, "semseg", "get-mod-preds", [1, {"3": 1e4}])
    assert _is_png(mod["seg_url"])
    assert mod["seg_url"] != orig["seg_url"]


def test_semseg_sae_latents(seg_server):
    out = _call(seg_server, "semseg", "get-sae-latents", [0, [0, 1, 2]])
    assert isinstance(out, list) and out, "fake run must fire some latent"
    for entry in out:
        assert 0 <= entry["latent"] < 32
        assert entry["examples"], "live latents must retrieve examples"
        for ex in entry["examples"]:
            assert _is_png(ex["orig_url"]) and _is_png(ex["highlighted_url"])
            assert ex["value"] > 0


def test_classification_endpoints(seg_server):
    img = _call(seg_server, "classification", "get-img", [2])
    assert _is_png(img["orig_url"]) and isinstance(img["target"], int)

    preds = _call(seg_server, "classification", "get-preds", [2])
    probs = preds["probs"]
    assert probs and abs(sum(probs.values()) - 1.0) < 1e-6

    null = _call(seg_server, "classification", "get-modified", [2, {}])
    for k, v in null["probs"].items():
        np.testing.assert_allclose(v, probs[k], atol=1e-6)
    for k, v in null["logits"].items():
        np.testing.assert_allclose(v, preds["logits"][k], atol=1e-5)

    # Probabilities can saturate; the LOGITS must move under a decoder-row
    # push (exact linear shift: dlogit = (v - f_l) * W_dec[l] @ w_head).
    mod = _call(seg_server, "classification", "get-modified", [2, {"5": 1e4}])
    assert abs(sum(mod["probs"].values()) - 1.0) < 1e-6
    deltas = [abs(mod["logits"][k] - preds["logits"][k]) for k in probs]
    assert max(deltas) > 1e-3, "a huge intervention must move the logits"

    latents = _call(seg_server, "classification", "get-sae-latents", [2, []])
    assert latents and all("examples" in e for e in latents)


def test_classification_random_class_img(seg_server):
    preds = _call(seg_server, "classification", "get-img", [0])
    cls = preds["target"]
    # The frontend sends [cls, seed] (examineClass bumps the seed per click);
    # the route's arity must pass BOTH through or every click repeats seed=0.
    out = _call(seg_server, "classification", "get-random-class-img", [cls, 0])
    assert out["target"] == cls and _is_png(out["orig_url"])
    picks = {
        _call(seg_server, "classification", "get-random-class-img", [cls, s])["index"]
        for s in range(8)
    }
    pool = [
        i for i in range(10)
        if _call(seg_server, "classification", "get-img", [i])["target"] == cls
    ]
    if len(pool) > 1:
        assert len(picks) > 1, "seed must vary the returned image"


def test_comparison_endpoints(seg_server):
    img = _call(seg_server, "comparison", "get-image", [3])
    assert _is_png(img["orig_url"]) and img["index"] == 3

    out = _call(seg_server, "comparison", "get-sae-activations", [3, None])
    assert isinstance(out, list) and len(out) == 1
    model = out[0]
    assert model["grid_h"] * model["grid_w"] > 0
    assert model["latents"]
    for entry in model["latents"]:
        acts = entry["activations"]
        assert len(acts) == model["grid_h"] * model["grid_w"]
        assert entry["examples"]

    # Explicitly requested latents come back verbatim.
    pick = [model["latents"][0]["latent"]]
    out2 = _call(seg_server, "comparison", "get-sae-activations", [3, {"0": pick}])
    assert [e["latent"] for e in out2[0]["latents"]] == pick


def test_meta_endpoints(seg_server):
    seg = _call(seg_server, "semseg", "meta", [])
    assert seg["grid_h"] * seg["grid_w"] > 0 and seg["n_examples"] == 10
    assert seg["d_sae"] == 32 and seg["classes"]

    cls = _call(seg_server, "classification", "meta", [])
    assert cls["n_examples"] == 10 and len(cls["classes"]) >= 2

    cmp_ = _call(seg_server, "comparison", "meta", [])
    assert len(cmp_["models"]) == 1
    assert cmp_["models"][0]["grid_h"] == seg["grid_h"]


def test_live_apps_served(tmp_path):
    """The server hosts the live JS apps from src/web (GET static files)."""
    import urllib.request

    from saev_tpu.web import backend

    web_root = pathlib.Path(__file__).resolve().parents[1] / "src" / "web"
    server = backend.make_server({}, port=0, web_root=web_root)
    backend.run_server(server)
    try:
        host, port = server.server_address
        for page in (
            "live/semseg/index.html",
            "live/classification/index.html",
            "live/comparison/index.html",
            "live/lib.js",
        ):
            with urllib.request.urlopen(
                f"http://{host}:{port}/{page}", timeout=30
            ) as resp:
                body = resp.read().decode()
            assert resp.status == 200 and body, page
            if page.endswith(".html"):
                assert "app.js" in body
        # Query strings (cache-busting) must not 404 the asset.
        with urllib.request.urlopen(
            f"http://{host}:{port}/live/lib.js?v=2", timeout=30
        ) as resp:
            assert resp.status == 200 and resp.read()
        # Path traversal is rejected.
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(
                f"http://{host}:{port}/../../etc/hostname", timeout=30
            )
        assert exc_info.value.code == 404
    finally:
        server.shutdown()


def test_layer_mismatch_rejected(tmp_path):
    """The backend refuses a --layer that differs from the layer the
    inference artifacts were computed with (probes and SAE codes must share
    a layer for the intervention algebra to mean anything)."""
    from saev_tpu.web import backend

    run, shards_dir = _build_run(tmp_path, seg=True, name="mismatchrun")
    backend._RUN_DATA_CACHE.clear()
    with pytest.raises(ValueError, match="not in the shards' recorded"):
        backend._load_run_data(run.run_dir, shards_dir, 3, 1.0)
    # Forge an inference config claiming a different layer.
    import json as json_mod

    from saev_tpu.data import Metadata

    md = Metadata.load(shards_dir)
    cfg_fpath = run.inference / md.hash / "config.json"
    payload = json_mod.loads(cfg_fpath.read_text())
    payload["data"]["layer"] = 7
    cfg_fpath.write_text(json_mod.dumps(payload))
    backend._RUN_DATA_CACHE.clear()
    with pytest.raises(ValueError, match="layer=7"):
        backend._load_run_data(run.run_dir, shards_dir, 0, 1.0)


def test_run_data_cached_across_apps(tmp_path):
    """The three apps over one (run, shards) pair share one _RunData (the
    CSR/CSC artifacts and the model are multi-GB at production scale)."""
    from saev_tpu.web import backend

    run, shards_dir = _build_run(tmp_path, seg=True, name="cachedrun")
    backend._RUN_DATA_CACHE.clear()
    a = backend._load_run_data(run.run_dir, shards_dir, 0, 1.0)
    b = backend._load_run_data(run.run_dir, shards_dir, 0, 1.0)
    assert a is b
    assert len(backend._RUN_DATA_CACHE) == 1


def test_live_js_calls_match_backend_routes():
    """Every api(app, endpoint) call in the live JS apps resolves to a real
    backend route (the JS cannot run here; this pins the contract)."""
    import re

    from saev_tpu.web import backend

    live = pathlib.Path(__file__).resolve().parents[1] / "src" / "web" / "live"
    calls = []
    for js in live.rglob("*.js"):
        calls += re.findall(r'api\(\s*"(\w+)",\s*"([\w-]+)"', js.read_text())
    assert calls, "live apps must make api() calls"
    for app, endpoint in calls:
        assert endpoint in backend._ROUTES[app], (app, endpoint)
    # Conversely every app is exercised by some live page.
    assert {app for app, _ in calls} == set(backend._ROUTES)


def test_unknown_endpoint_404(seg_server):
    with pytest.raises(urllib.error.HTTPError) as exc_info:
        _call(seg_server, "semseg", "no-such-endpoint", [])
    assert exc_info.value.code == 404


def test_bad_args_500_with_named_error(seg_server):
    with pytest.raises(urllib.error.HTTPError) as exc_info:
        _call(seg_server, "semseg", "get-img", [])
    assert exc_info.value.code == 500
    body = json.loads(exc_info.value.read())
    assert "error" in body and "get-img" in body["error"] or "args" in body["error"]
