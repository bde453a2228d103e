"""interactive_interp contrib tests: semseg probes + semprobe scoring on fake
segmentation shards."""

import pathlib
import sys

import numpy as np

sys.path.insert(
    0, str(pathlib.Path(__file__).parent.parent / "contrib" / "interactive_interp")
)

from conftest import _Helpers as helpers


def test_semseg_probe_trains_and_scores(tmp_path):
    from semseg import training

    shards_dir = helpers.write_shards(tmp_path, n_examples=16, layers=(0,), seg=True)
    cfgs = [
        training.Train(
            shards=shards_dir, layer=0, n_classes=8, learning_rate=1e-2,
            n_train=2048, batch_size=128, seed=1,
            ckpt_path=tmp_path / "ckpt",
        ),
        training.Train(
            shards=shards_dir, layer=0, n_classes=8, learning_rate=3e-3,
            n_train=2048, batch_size=128, seed=1,
            ckpt_path=tmp_path / "ckpt",
        ),
    ]
    params = training.train(cfgs)
    assert np.asarray(params["w"]).shape[0] == 2

    fpath = training.dump(tmp_path / "ckpt", cfgs, params)
    assert fpath.exists()
    loaded = training.load(tmp_path / "ckpt")
    np.testing.assert_allclose(loaded["w"], np.asarray(params["w"]))

    # Evaluate on the shard data itself.
    from saev_tpu.data import IndexedConfig, IndexedDataset, Metadata

    md = Metadata.load(shards_dir)
    ds = IndexedDataset(IndexedConfig(shards=shards_dir, layer=0))
    labels = np.memmap(
        shards_dir / "labels.bin", mode="r", dtype=np.uint8,
        shape=(md.n_examples, md.content_tokens_per_example),
    ).reshape(-1)
    acts = np.stack([ds[i]["act"] for i in range(len(labels))])
    preds = training.predict(loaded, acts, probe_i=0)
    ious = training.get_class_ious(preds, labels, 8)
    assert np.isfinite(ious[~np.isnan(ious)]).all()
    # The fake seg labels are deterministic functions of position; a linear
    # probe on fake-vit activations should beat chance (1/8) on accuracy.
    acc = (preds == labels).mean()
    assert acc > 1.5 / 8, acc


def test_semprobe_scoring(tmp_path):
    import jax

    from saev_tpu import nn
    from saev_tpu.data import Metadata, fake_vit
    from saev_tpu.nn import modeling
    from semprobe import scoring

    shards_dir = helpers.write_shards(tmp_path, n_examples=8, layers=(0,))
    md = Metadata.load(shards_dir)
    cfg = modeling.SparseAutoencoderConfig(
        d_model=fake_vit.D_MODEL, d_sae=16, activation=modeling.TopK(top_k=4)
    )
    params, state = modeling.init(cfg, jax.random.key(0))
    ckpt = tmp_path / "sae.pt"
    nn.dump(ckpt, cfg, params, state)

    labels = tuple(
        f"stripes-{'positive' if i % 2 == 0 else 'negative'}" for i in range(8)
    )
    results = scoring.score(
        scoring.Score(
            sae_ckpt=ckpt, shards=shards_dir, labels=labels,
            batch_size=64, dump_to=tmp_path / "semprobe",
        )
    )
    assert "stripes" in results
    assert 0.0 <= results["stripes"]["best_f1"] <= 1.0
    assert len(results["stripes"]["top_latents"]) == 5
    assert (tmp_path / "semprobe" / "semprobe_scores.json").exists()


def test_semseg_interactive_app(tmp_path):
    """The intervention explorer: generate the single-file app over fake seg
    shards + a trained probe + an SAE, then verify the payload's exact-logit
    construction (head linearity) against a direct recompute."""
    import json
    import re

    import jax

    from saev_tpu import nn
    from saev_tpu.data import OrderedConfig
    from saev_tpu.nn import modeling
    from semseg import interactive, training

    shards_dir = helpers.write_shards(tmp_path, n_examples=12, layers=(0,), seg=True)

    head_cfg = training.Train(
        shards=shards_dir, layer=0, n_classes=8, learning_rate=1e-2,
        n_train=1024, batch_size=128, seed=1, ckpt_path=tmp_path / "head",
    )
    params_head = training.train([head_cfg])
    training.dump(head_cfg.ckpt_path, [head_cfg], params_head)

    from saev_tpu.data import Metadata

    md = Metadata.load(shards_dir)
    sae_cfg = modeling.SparseAutoencoderConfig(
        d_model=md.d_model, d_sae=64,
        activation=modeling.TopK(top_k=4),
    )
    params, state = modeling.init(sae_cfg, jax.random.key(0))
    ckpt = tmp_path / "sae.pt"
    nn.dump(ckpt, sae_cfg, params, state)

    out = interactive.worker_fn(interactive.Config(
        sae_ckpt=ckpt,
        head_ckpt=head_cfg.ckpt_path,
        acts=OrderedConfig(shards=shards_dir, layer=0, batch_size=64),
        n_classes=8,
        n_examples=4,
        n_features=2,
        n_random=1,
        sparsity_max=1.1,  # untrained SAE: latents aren't sparse yet
        out=tmp_path / "app.html",
    ))
    html_doc = out.read_text()
    payload = json.loads(re.search(r"const D = (\{.*?\});\n", html_doc, re.S).group(1))

    assert len(payload["examples"]) == 4
    assert payload["gw"] * payload["gh"] == md.content_tokens_per_example
    assert payload["perClass"], "no classes got feature proposals"
    assert len(payload["candidates"]) == len(payload["maxObs"])
    assert len(payload["directions"]) == len(payload["candidates"])

    # Exactness of the linear-shift trick: replacing candidate latent j with
    # value v must shift logits by (v - f_x) * direction, matching a direct
    # recompute through decode + head.
    import numpy as np

    ex = payload["examples"][0]
    j = 0
    latent = payload["candidates"][j]
    v = 0.7 * payload["maxObs"][j]
    base = np.asarray(ex["logits"])  # (P, C)
    fx = np.asarray(ex["fx"])[:, j]  # (P,)
    dirs = np.asarray(payload["directions"][j])  # (C,)
    shifted = base + (v - fx)[:, None] * dirs[None, :]

    # Direct recompute: err + modified decode -> head.
    import jax.numpy as jnp

    from saev_tpu.data import IndexedConfig, IndexedDataset

    ds = IndexedDataset(IndexedConfig(shards=shards_dir, layer=0))
    p = md.content_tokens_per_example
    acts = ds.take(np.arange(p))["act"]
    head = training.load(head_cfg.ckpt_path)
    w_h, b_h = np.asarray(head["w"][0]), np.asarray(head["b"][0])
    enc, _ = modeling.encode(sae_cfg, params, state, jnp.asarray(acts), training=False)
    f_full = np.asarray(enc.f_x)
    xhat = np.asarray(modeling.decode(sae_cfg, params, enc.f_x))[:, -1, :]
    err = acts - xhat
    f_mod = f_full.copy()
    f_mod[:, latent] = v
    w_dec = np.asarray(params["W_dec"])
    b_dec = np.asarray(params["b_dec"])
    modified_acts = err + f_mod @ w_dec + b_dec
    want = modified_acts @ w_h + b_h
    np.testing.assert_allclose(shifted, want, rtol=1e-3, atol=2e-2)

    for needle in ("Random Example", "interpolated", "slider", "cvMod"):
        assert needle in html_doc, needle


def test_semprobe_negatives(tmp_path):
    from saev_tpu.data import datasets
    from semprobe import scoring as semprobe_scoring

    saved = semprobe_scoring.negatives(semprobe_scoring.Negatives(
        dump_to=tmp_path / "neg",
        data=datasets.FakeImg(n_examples=12),
        classes=("stripes",),
        n_imgs=5,
        skip=(0, 1),
    ))
    assert saved == {"stripes": 5}
    files = sorted((tmp_path / "neg" / "stripes-negative").glob("*.png"))
    assert len(files) == 5
    # skipped indices never sampled
    assert not any(f.stem.endswith(("_0", "_1")) for f in files)


def test_make_figures(tmp_path):
    import importlib.util

    from PIL import Image

    fpath = (
        pathlib.Path(__file__).parent.parent
        / "contrib" / "interactive_interp" / "scripts" / "make_figures.py"
    )
    spec = importlib.util.spec_from_file_location("ii_make_figures", fpath)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    src = tmp_path / "img.png"
    Image.new("RGB", (640, 480), (40, 80, 160)).save(src)
    out = mod.overview(mod.Overview(
        image=src, out=tmp_path / "figs", size=448, grid=16, patches=(0, 17, 255),
    ))
    assert out.exists()
    img = Image.open(out)
    assert img.size == (448, 448)
    for p in (0, 17, 255):
        assert (tmp_path / "figs" / f"img_patch{p}.png").exists()
    # Highlighted patches are tinted (rose fill over the flat blue base).
    import numpy as np

    arr = np.asarray(img.convert("RGB"))
    assert (arr[0, 0] != arr[100, 100]).any()  # patch 0 differs from untinted

    bars = mod.barchart(mod.Barchart(
        values=(80.0, 15.0), labels=("otter", "beaver"),
        out=tmp_path / "figs" / "probs.png",
    ))
    assert bars.exists()
    leg = mod.legend(mod.Legend(out=tmp_path / "figs" / "legend.png"))
    assert leg.exists()
