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
