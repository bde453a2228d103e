"""LIVE disk-protocol interop against the reference's own storage code.

The round-2 parity suite proved checkpoint interop bidirectionally through
the reference's `saev.nn`; this file does the same for the SHARD protocol
through the reference's `saev.data.shards` (Metadata :44, ShardWriter :372,
ShardInfo :595, IndexMap :987):

- shards written by OUR extraction pipeline load, validate, hash-match, and
  index identically under the reference's code;
- shards written by the REFERENCE's ShardWriter stream correctly through OUR
  Shuffled/Indexed loaders, byte-for-byte.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from conftest import _Helpers as helpers
from conftest import load_reference_data_module, load_reference_module
from saev_tpu.data import indexed, shards as our_shards, shuffled


@pytest.fixture(scope="module")
def ref_shards():
    return load_reference_data_module("shards")


def test_our_shards_read_by_reference(tmp_path, ref_shards):
    shards_dir = helpers.write_shards(tmp_path, n_examples=10, layers=(0, 1))

    md_ref = ref_shards.Metadata.load(shards_dir)
    md_ours = our_shards.Metadata.load(shards_dir)
    assert md_ref.shard_shape == md_ours.shard_shape
    assert md_ref.examples_per_shard == md_ours.examples_per_shard
    assert md_ref.n_shards == md_ours.n_shards
    assert md_ref.layers == md_ours.layers

    # The content hash is the shard dir's name: the reference's own hash code
    # must agree with the directory OUR dump created.
    assert md_ref.hash == shards_dir.name == md_ours.hash

    info = ref_shards.ShardInfo.load(shards_dir)
    info.validate(shards_dir)
    assert sum(s.n_examples for s in info) == md_ref.n_examples

    # Reference IndexMap coordinates must locate the same bytes our indexed
    # dataset returns.
    imap = ref_shards.IndexMap(md_ref, "content", 1)
    ds = indexed.Dataset(indexed.Config(shards=shards_dir, layer=1))
    assert len(imap) == len(ds)
    for i in (0, 7, 63, len(ds) - 1):
        idx = imap.from_global(i)
        mm = np.memmap(
            shards_dir / f"acts{idx.shard_idx:06}.bin",
            mode="r", dtype=np.float32, shape=md_ref.shard_shape,
        )
        want = np.array(
            mm[idx.example_idx_in_shard, idx.layer_idx_in_shard, idx.token_idx_in_shard]
        )
        np.testing.assert_array_equal(ds[i]["act"], want)
        assert ds[i]["example_idx"] == idx.example_idx


def test_reference_written_shards_read_by_us(tmp_path, ref_shards):
    from saev_tpu.data import datasets

    root = helpers.tmp_shards_root(tmp_path)
    n_examples, tokens, d_model = 6, 4, 16
    data_cfg = datasets.FakeImg(n_examples=n_examples)
    md = ref_shards.Metadata(
        family="fake-clip",
        ckpt="interop",
        layers=(0,),
        content_tokens_per_example=tokens,
        cls_token=True,
        d_model=d_model,
        n_examples=n_examples,
        max_tokens_per_shard=(tokens + 1) * 2,  # 2 examples/shard -> 3 shards
        data=our_shards.encode_dataset_cfg(data_cfg),
        dataset=data_cfg.root,
    )
    md.dump(root)
    shards_dir = root / md.hash

    rng = np.random.default_rng(0)
    acts = rng.normal(size=(n_examples, 1, tokens + 1, d_model)).astype(np.float32)
    with ref_shards.ShardWriter(root, md) as writer:
        writer.write_batch(torch.from_numpy(acts[:4]), 0)
        writer.write_batch(torch.from_numpy(acts[4:]), 4)

    # Our loaders must accept and reproduce the reference-written bytes.
    md_ours = our_shards.Metadata.load(shards_dir)
    assert md_ours.hash == md.hash
    info = our_shards.ShardInfo.load(shards_dir)
    info.validate(shards_dir)

    ds = indexed.Dataset(indexed.Config(shards=shards_dir, layer=0))
    for i in range(n_examples * tokens):
        ex, tok = i // tokens, i % tokens
        np.testing.assert_array_equal(ds[i]["act"], acts[ex, 0, tok + 1])

    dl = shuffled.DataLoader(shuffled.Config(
        shards=shards_dir, layer=0, batch_size=8, n_threads=1, buffer_size=2,
    ))
    seen = 0
    for batch in dl:
        for e, t, act in zip(batch["example_idx"], batch["token_idx"], batch["act"]):
            np.testing.assert_array_equal(act, acts[int(e), 0, int(t) + 1])
            seen += 1
    assert seen == n_examples * tokens


def test_run_dir_interop(tmp_path, ref_shards):
    """Run directories scaffolded by OUR disk.Run.new validate under the
    reference's disk.Run (reference disk.py:67-128) and vice versa."""
    import saev_tpu.disk

    ref_disk = load_reference_module("disk")
    shards_dir = helpers.write_shards(tmp_path, n_examples=4, layers=(0,))
    runs_root = helpers.tmp_runs_root(tmp_path)

    ours = saev_tpu.disk.Run.new(
        "interop1", train_shards_dir=shards_dir, val_shards_dir=shards_dir,
        runs_root=runs_root,
    )
    theirs = ref_disk.Run(ours.run_dir)
    assert theirs.run_dir == ours.run_dir
    # The links/ symlinks must resolve to the shard dirs on both sides.
    assert (ours.run_dir / "links" / "train-shards").resolve() == shards_dir.resolve()

    made_by_ref = ref_disk.Run.new(
        "interop2", train_shards_dir=shards_dir, val_shards_dir=shards_dir,
        runs_root=runs_root,
    )
    reopened = saev_tpu.disk.Run(made_by_ref.run_dir)
    assert reopened.run_dir == made_by_ref.run_dir
    assert reopened.ckpt.parent.exists()


def test_sweep_engine_equivalence(tmp_path):
    """Our sweep loader/expander must agree with the reference's own
    configs.py (load_sweep :17, expand :100) on the same sweep file."""
    import saev_tpu.configs

    ref_configs = load_reference_module("configs")

    sweep = tmp_path / "sweep.py"
    sweep.write_text(
        "def make_cfgs():\n"
        "    return [\n"
        "        {'lr': [1e-4, 4e-4], 'sae': {'d_sae': [1024, 2048]},\n"
        "         'optim': 'adam'},\n"
        "        {'lr': 3e-4, 'tags': ['a', 'b']},\n"
        "    ]\n"
    )

    ref_dcts = ref_configs.load_sweep(sweep)
    our_dcts = saev_tpu.configs.load_sweep(sweep)
    assert ref_dcts == our_dcts

    ref_expanded = [e for d in ref_dcts for e in ref_configs.expand(d)]
    our_expanded = [e for d in our_dcts for e in saev_tpu.configs.expand(d)]
    assert ref_expanded == our_expanded
    assert len(ref_expanded) == 6  # 2x2 cartesian + 2 (every list expands)


def test_metrics_json_interop(tmp_path):
    """metrics.json written by OUR inference round-trips through the
    reference's validated Metrics (reference metrics.py:15-159), and a
    reference-built Metrics dict loads under ours."""
    import json

    import jax

    import saev_tpu.disk
    import saev_tpu.metrics
    from saev_tpu import nn
    from saev_tpu.data import Metadata, OrderedConfig, fake_vit
    from saev_tpu.framework import inference
    from saev_tpu.nn import modeling

    ref_metrics = load_reference_module("metrics")

    shards_dir = helpers.write_shards(tmp_path, n_examples=6, layers=(0,))
    md = Metadata.load(shards_dir)
    runs_root = helpers.tmp_runs_root(tmp_path)
    run = saev_tpu.disk.Run.new(
        "metrun", train_shards_dir=shards_dir, val_shards_dir=shards_dir,
        runs_root=runs_root,
    )
    cfg = modeling.SparseAutoencoderConfig(
        d_model=fake_vit.D_MODEL, d_sae=16, activation=modeling.TopK(top_k=3)
    )
    params, state = modeling.init(cfg, jax.random.key(0))
    nn.dump(run.ckpt, cfg, params, state)
    inference.worker_fn(inference.Config(
        run=run.run_dir,
        data=OrderedConfig(shards=shards_dir, layer=0, batch_size=24),
        device="cpu",
    ))

    dct = json.loads((run.inference / md.hash / "metrics.json").read_text())
    theirs = ref_metrics.Metrics.from_dict(dct)  # their validators must accept
    assert theirs.n_tokens == dct["n_tokens"]

    back = saev_tpu.metrics.Metrics.from_dict(theirs.to_dict())
    assert back.to_dict() == dct


def test_csr_topk_interop():
    """helpers.csr_topk agrees with the reference's implementation (reference
    helpers.py:684-710) on both axes over a realistic sparse matrix."""
    import scipy.sparse

    import saev_tpu.helpers

    ref_helpers = load_reference_module("helpers")

    rng = np.random.default_rng(0)
    dense = rng.normal(size=(200, 40)).astype(np.float32)
    dense[rng.random(dense.shape) < 0.9] = 0.0
    csr = scipy.sparse.csr_matrix(np.maximum(dense, 0))

    for axis, k in ((0, 7), (1, 5)):
        ours = saev_tpu.helpers.csr_topk(csr, k=k, axis=axis)
        theirs = ref_helpers.csr_topk(csr, k=k, axis=axis)
        np.testing.assert_array_equal(ours.values, theirs.values)
        # Indices may differ on ties at exact zero; values above pin the
        # retrieval; check indices agree wherever values are unique-positive.
        pos = ours.values > 0
        np.testing.assert_array_equal(
            ours.indices[pos], theirs.indices[pos]
        )


def test_scheduling_interop():
    """warmup_cosine values match the reference's stateful WarmupCosine
    scheduler step for step (reference utils/scheduling.py:42-71); the
    reference's step() call number t yields the LR our pure function gives
    at step index t."""
    from saev_tpu.utils import scheduling as ours

    theirs = load_reference_module("utils.scheduling")

    ref_wc = theirs.WarmupCosine(
        init=0.0, peak=4e-4, final=0.0, n_warmup=50, n_steps=500
    )
    for t in range(1, 601):
        want = ref_wc.step()
        got = float(ours.warmup_cosine(t, 0.0, 50, 4e-4, 500, 0.0))
        # f32 cosine tail loses relative precision near zero; 1e-9 ABSOLUTE
        # on a 4e-4-scale LR pins the schedule hard.
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-9, err_msg=str(t))


def test_batch_entropy_interop():
    """calc_batch_entropy metrics match the reference's implementation
    (reference utils/statistics.py:57-126)."""
    import torch as _torch

    from saev_tpu.utils import statistics as ours

    theirs = load_reference_module("utils.statistics")

    rng = np.random.default_rng(3)
    example_idx = rng.integers(0, 50, size=512)
    token_idx = rng.integers(0, 16, size=512)

    got = ours.calc_batch_entropy(example_idx, token_idx, 50, 16)
    want = theirs.calc_batch_entropy(
        _torch.from_numpy(example_idx), _torch.from_numpy(token_idx), 50, 16
    )
    for key, value in want.items():
        assert key in got, (key, sorted(got))
        np.testing.assert_allclose(got[key], value, rtol=1e-6, err_msg=key)


@pytest.mark.timeout(180)
def test_reference_ordered_loader_reads_our_shards(tmp_path):
    """The reference's OrderedDataLoader — manager process and all — streams
    OUR shards in exact global order, matching our ordered loader batch for
    batch (reference ordered.py:46-376). Works because the platform's fork
    start method lets the manager child inherit the stubbed module graph."""
    import torch.multiprocessing as mp

    if mp.get_start_method(allow_none=True) not in (None, "fork"):
        pytest.skip("needs fork start method so the child inherits refstubs")

    from saev_tpu.data import ordered as our_ordered

    ref_ordered = load_reference_data_module("ordered")
    shards_dir = helpers.write_shards(tmp_path, n_examples=10, layers=(0, 1))

    ref_dl = ref_ordered.DataLoader(ref_ordered.Config(
        shards=shards_dir, layer=1, batch_size=48, buffer_size=4,
    ))
    ref_batches = [
        {k: np.asarray(v) for k, v in b.items()} for b in ref_dl
    ]

    our_dl = our_ordered.DataLoader(our_ordered.Config(
        shards=shards_dir, layer=1, batch_size=48,
    ))
    our_batches = list(our_dl)

    assert len(ref_batches) == len(our_batches)
    for ref_b, our_b in zip(ref_batches, our_batches):
        np.testing.assert_array_equal(ref_b["act"], our_b["act"])
        np.testing.assert_array_equal(ref_b["example_idx"], our_b["example_idx"])
        np.testing.assert_array_equal(ref_b["token_idx"], our_b["token_idx"])


@pytest.mark.timeout(300)
def test_reference_shuffled_loader_reads_our_shards(tmp_path):
    """The reference's ShuffledDataLoader (manager process + I/O threads +
    shared-memory reservoir, reference shuffled.py:380-699) covers OUR shards
    exactly once with byte-identical activations."""
    import torch.multiprocessing as mp

    if mp.get_start_method(allow_none=True) not in (None, "fork"):
        pytest.skip("needs fork start method so the child inherits refstubs")

    ref_shuffled = load_reference_data_module("shuffled")
    shards_dir = helpers.write_shards(tmp_path, n_examples=10, layers=(0, 1))

    from saev_tpu.data import indexed

    ds = indexed.Dataset(indexed.Config(shards=shards_dir, layer=1))
    want = {
        (ex["example_idx"], ex["token_idx"]): ex["act"]
        for ex in (ds[i] for i in range(len(ds)))
    }

    dl = ref_shuffled.DataLoader(ref_shuffled.Config(
        shards=shards_dir, layer=1, batch_size=32, n_threads=2, buffer_size=4,
        batch_timeout_s=60.0,
    ))
    seen = set()
    try:
        for batch in dl:
            acts = np.asarray(batch["act"])
            for e, t, act in zip(
                np.asarray(batch["example_idx"]), np.asarray(batch["token_idx"]), acts
            ):
                key = (int(e), int(t))
                assert key not in seen
                seen.add(key)
                np.testing.assert_array_equal(act, want[key])
    finally:
        dl.shutdown()
    assert seen == set(want)


def test_prefix_sampling_distribution_interop():
    """Our host-side Pareto prefix sampler draws from the SAME distribution as
    the reference's torch sampler (reference objectives.py:161-201). RNG
    streams differ by design (numpy vs torch), so this pins the marginal
    distribution: a two-sample KS test over pooled draws must not reject."""
    import torch as _torch

    from saev_tpu.nn import objectives as ours

    ref_obj = load_reference_module("nn.objectives")

    d_sae, n_prefixes, n_draws = 512, 6, 800
    rng = np.random.default_rng(0)
    _torch.manual_seed(0)
    our_samples = np.concatenate([
        ours.sample_prefixes(d_sae, n_prefixes, rng=rng)[:-1]  # drop fixed d_sae
        for _ in range(n_draws)
    ])
    ref_samples = np.concatenate([
        ref_obj.sample_prefixes(d_sae, n_prefixes).numpy()[:-1]
        for _ in range(n_draws)
    ])

    import scipy.stats

    ks = scipy.stats.ks_2samp(our_samples, ref_samples)
    assert ks.pvalue > 1e-3, (ks.statistic, ks.pvalue)
    # Shape sanity: the Pareto favors SHORT prefixes on both sides.
    assert np.median(our_samples) < d_sae / 4
    assert np.median(ref_samples) < d_sae / 4


@pytest.mark.parametrize("agg", ["majority", "prefer-fg"])
def test_pixel_to_patch_labels_interop(ref_shards, agg):
    """Pixel->patch label aggregation agrees exactly with the reference's
    implementation for both policies (reference shards.py:894-961), including
    majority ties and background-dominant patches."""
    from PIL import Image

    from saev_tpu.data import shards as ours

    rng = np.random.default_rng(0)
    h = w = 32
    patch = 8
    n_patches = (h // patch) * (w // patch)
    # Blocky masks with ties and background-heavy regions.
    seg = rng.integers(0, 4, size=(h // 4, w // 4)).repeat(4, 0).repeat(4, 1)
    seg_img = Image.fromarray(seg.astype(np.uint8))

    want = ref_shards.pixel_to_patch_labels(
        seg_img, n_patches, patch,
        pixel_agg=ref_shards.PixelAgg(agg), bg_label=0,
    ).numpy()
    got = np.asarray(ours.pixel_to_patch_labels(
        np.asarray(seg_img, dtype=np.uint8), n_patches, patch_size=patch,
        pixel_agg=ours.PixelAgg(agg), bg_label=0,
    ))
    np.testing.assert_array_equal(got, want)


@pytest.mark.timeout(180)
def test_reference_ordered_loader_token_labels(tmp_path):
    """Labeled shards: the reference's ordered loader attaches the same
    token_labels ours does (reference ordered.py:124-158)."""
    import torch.multiprocessing as mp

    if mp.get_start_method(allow_none=True) not in (None, "fork"):
        pytest.skip("needs fork start method so the child inherits refstubs")

    from saev_tpu.data import ordered as our_ordered

    ref_ordered = load_reference_data_module("ordered")
    seg_dir = helpers.write_shards(tmp_path, n_examples=6, layers=(0,), seg=True)

    ref_dl = ref_ordered.DataLoader(ref_ordered.Config(
        shards=seg_dir, layer=0, batch_size=32, buffer_size=4,
    ))
    ref_batches = [{k: np.asarray(v) for k, v in b.items()} for b in ref_dl]
    our_batches = list(our_ordered.DataLoader(our_ordered.Config(
        shards=seg_dir, layer=0, batch_size=32,
    )))

    assert len(ref_batches) == len(our_batches)
    for ref_b, our_b in zip(ref_batches, our_batches):
        assert "token_labels" in ref_b and "token_labels" in our_b
        np.testing.assert_array_equal(ref_b["token_labels"], our_b["token_labels"])
        np.testing.assert_array_equal(ref_b["act"], our_b["act"])
