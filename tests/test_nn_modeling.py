"""Unit tests for the SAE core (mirrors reference tests/test_nn_modeling.py and
test_nn_activations.py coverage: activation semantics, Matryoshka decode, decoder
constraints, checkpoint round-trips)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from saev_tpu import nn
from saev_tpu.nn import modeling


def make_sae(d_model=8, d_sae=32, activation=None, **kw):
    cfg = modeling.SparseAutoencoderConfig(
        d_model=d_model,
        d_sae=d_sae,
        activation=activation or modeling.Relu(),
        **kw,
    )
    params, state = modeling.init(cfg, jax.random.key(0))
    return cfg, params, state


def test_init_shapes_and_norms():
    cfg, params, state = make_sae()
    assert params["W_dec"].shape == (32, 8)
    assert params["W_enc"].shape == (8, 32)
    assert params["b_dec"].shape == (8,)
    assert params["b_enc"].shape == (32,)
    norms = jnp.linalg.norm(params["W_dec"], axis=1)
    np.testing.assert_allclose(np.asarray(norms), 1.0, rtol=1e-5)
    # W_enc is the transpose of the normalized W_dec.
    np.testing.assert_allclose(
        np.asarray(params["W_enc"]), np.asarray(params["W_dec"].T), rtol=1e-6
    )


def test_relu_encode():
    cfg, params, state = make_sae(activation=modeling.Relu())
    x = jax.random.normal(jax.random.key(1), (4, 8))
    enc, new_state = modeling.encode(cfg, params, state, x, training=True)
    expected_h = x @ params["W_enc"] + params["b_enc"]
    np.testing.assert_allclose(np.asarray(enc.h_x), np.asarray(expected_h), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(enc.f_x), np.maximum(np.asarray(expected_h), 0), rtol=1e-5
    )


def test_topk_keeps_k_per_row():
    k = 4
    cfg, params, state = make_sae(activation=modeling.TopK(top_k=k))
    x = jax.random.normal(jax.random.key(2), (16, 8))
    enc, _ = modeling.encode(cfg, params, state, x, training=True)
    nnz = np.count_nonzero(np.asarray(enc.f_x), axis=1)
    assert (nnz == k).all()
    # Kept values are the k largest per row.
    h = np.asarray(enc.h_x)
    f = np.asarray(enc.f_x)
    for row_h, row_f in zip(h, f):
        top = np.sort(row_h)[-k:]
        np.testing.assert_allclose(np.sort(row_f[row_f != 0]), np.sort(top), rtol=1e-6)


def test_topk_gradient_masks_nonselected():
    k = 2
    d_sae = 8
    h = jnp.array([[5.0, 4.0, 3.0, 2.0, 1.0, 0.5, -1.0, -2.0]])

    def f(h):
        return jnp.sum(modeling.topk_activation(h, k) * jnp.arange(1.0, d_sae + 1.0))

    g = jax.grad(f)(h)
    # Gradient flows only to the selected (two largest) entries.
    expected = np.zeros((1, d_sae))
    expected[0, 0] = 1.0
    expected[0, 1] = 2.0
    np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-6)


def test_batch_topk_budget_moves_across_batch():
    k = 2
    bsz, d_sae = 4, 8
    # One row has all the large values: batch-global top (k*bsz)=8 all in row 0.
    h = jnp.concatenate(
        [jnp.arange(10.0, 18.0)[None, :], jnp.full((bsz - 1, d_sae), -1.0)], axis=0
    )
    f, new_thr = modeling.batch_topk_train(h, k, momentum=0.1, threshold=jnp.float32(0))
    assert np.count_nonzero(np.asarray(f)) == k * bsz
    assert np.count_nonzero(np.asarray(f)[0]) == d_sae
    # EMA threshold updated toward min surviving positive (=10.0).
    np.testing.assert_allclose(float(new_thr), 0.1 * 10.0, rtol=1e-6)


def test_batch_topk_eval_jumprelu():
    h = jnp.array([[0.5, 1.5, -0.3, 2.0]])
    out = modeling.batch_topk_eval(h, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(out), [[0.0, 1.5, 0.0, 2.0]])
    # threshold <= 0 -> plain ReLU
    out = modeling.batch_topk_eval(h, jnp.float32(-1.0))
    np.testing.assert_allclose(np.asarray(out), [[0.5, 1.5, 0.0, 2.0]])


def test_batch_topk_threshold_no_update_at_eval():
    cfg, params, state = make_sae(activation=modeling.BatchTopK(top_k=2))
    x = jax.random.normal(jax.random.key(3), (4, 8))
    _, st_eval = modeling.encode(cfg, params, state, x, training=False)
    assert float(st_eval["threshold"]) == 0.0
    _, st_train = modeling.encode(cfg, params, state, x, training=True)
    assert float(st_train["threshold"]) != 0.0


@pytest.mark.parametrize("group_size", [4, 5, 512])
def test_matryoshka_decode_matches_naive(group_size):
    cfg, params, state = make_sae(d_model=8, d_sae=32)
    f_x = jax.random.normal(jax.random.key(4), (6, 32))
    prefixes = jnp.array([3, 7, 17, 32], dtype=jnp.int32)
    x_hats = modeling.decode(cfg, params, f_x, prefixes, group_size=group_size)
    assert x_hats.shape == (6, 4, 8)
    f_np = np.asarray(f_x)
    w = np.asarray(params["W_dec"])
    b = np.asarray(params["b_dec"])
    for j, p in enumerate([3, 7, 17, 32]):
        naive = f_np[:, :p] @ w[:p] + b
        np.testing.assert_allclose(np.asarray(x_hats[:, j]), naive, rtol=1e-4, atol=1e-5)


def test_decode_full_prefix_only():
    cfg, params, state = make_sae()
    f_x = jax.random.normal(jax.random.key(5), (3, 32))
    x_hat = modeling.decode(cfg, params, f_x)
    assert x_hat.shape == (3, 1, 8)
    naive = np.asarray(f_x) @ np.asarray(params["W_dec"]) + np.asarray(params["b_dec"])
    np.testing.assert_allclose(np.asarray(x_hat[:, 0]), naive, rtol=1e-4, atol=1e-5)


def test_decode_prefix_group_boundary():
    # Prefix exactly at a group boundary and prefix == d_sae with g | d_sae.
    cfg, params, state = make_sae(d_model=8, d_sae=32)
    f_x = jax.random.normal(jax.random.key(6), (2, 32))
    prefixes = jnp.array([8, 16, 32], dtype=jnp.int32)
    x_hats = modeling.decode(cfg, params, f_x, prefixes, group_size=8)
    f_np, w, b = np.asarray(f_x), np.asarray(params["W_dec"]), np.asarray(params["b_dec"])
    for j, p in enumerate([8, 16, 32]):
        np.testing.assert_allclose(
            np.asarray(x_hats[:, j]), f_np[:, :p] @ w[:p] + b, rtol=1e-4, atol=1e-5
        )


def test_decode_gradients_flow():
    cfg, params, state = make_sae(d_model=8, d_sae=32)
    prefixes = jnp.array([5, 32], dtype=jnp.int32)

    def loss_fn(params, f_x):
        return jnp.sum(modeling.decode(cfg, params, f_x, prefixes) ** 2)

    f_x = jax.random.normal(jax.random.key(7), (3, 32))
    grads = jax.grad(loss_fn)(params, f_x)
    assert grads["W_dec"].shape == params["W_dec"].shape
    assert np.isfinite(np.asarray(grads["W_dec"])).all()
    # Latents beyond the last prefix... prefixes end at d_sae so all get gradient
    # through the full prefix; latents in [5, 32) get gradient only from prefix 32.
    g_f = jax.grad(lambda f: loss_fn(params, f))(f_x)
    assert np.isfinite(np.asarray(g_f)).all()


def test_normalize_w_dec():
    cfg, params, _ = make_sae()
    params = {**params, "W_dec": params["W_dec"] * 3.0}
    out = modeling.normalize_w_dec(cfg, params)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(out["W_dec"], axis=1)), 1.0, rtol=1e-5
    )
    # Disabled -> no-op
    cfg_off = modeling.SparseAutoencoderConfig(
        d_model=8, d_sae=32, activation=modeling.Relu(), normalize_w_dec=False
    )
    out2 = modeling.normalize_w_dec(cfg_off, params)
    np.testing.assert_allclose(np.asarray(out2["W_dec"]), np.asarray(params["W_dec"]))


def test_remove_parallel_grads_orthogonalizes():
    cfg, params, _ = make_sae()
    grads = {
        "W_dec": jax.random.normal(jax.random.key(8), params["W_dec"].shape),
        "b_dec": jnp.zeros_like(params["b_dec"]),
        "W_enc": jnp.zeros_like(params["W_enc"]),
        "b_enc": jnp.zeros_like(params["b_enc"]),
    }
    out = modeling.remove_parallel_grads(cfg, params, grads)
    dots = jnp.sum(out["W_dec"] * params["W_dec"], axis=1)
    np.testing.assert_allclose(np.asarray(dots), 0.0, atol=1e-5)


def test_dump_load_roundtrip(tmp_path):
    for activation in [
        modeling.Relu(),
        modeling.TopK(top_k=7),
        modeling.BatchTopK(top_k=3, momentum=0.2),
    ]:
        cfg, params, state = make_sae(d_model=8, d_sae=16, activation=activation)
        state = {**state, "threshold": jnp.float32(0.75)}
        fpath = tmp_path / f"sae_{activation.key}.pt"
        nn.dump(fpath, cfg, params, state)
        cfg2, params2, state2 = nn.load(fpath)
        assert cfg2 == cfg
        for k in params:
            np.testing.assert_array_equal(np.asarray(params[k]), np.asarray(params2[k]))
        if isinstance(activation, modeling.BatchTopK):
            assert float(state2["threshold"]) == 0.75


def test_load_reference_torch_checkpoint(tmp_path):
    """A checkpoint written by torch code in the reference's exact format loads here
    and produces matching forward outputs (parity harness, SURVEY.md §7.2 step 3)."""
    torch = pytest.importorskip("torch")
    import json as _json

    d_model, d_sae = 8, 16
    g = torch.Generator().manual_seed(0)
    sd = {
        "W_dec": torch.randn(d_sae, d_model, generator=g),
        "b_dec": torch.randn(d_model, generator=g),
        "W_enc": torch.randn(d_model, d_sae, generator=g),
        "b_enc": torch.randn(d_sae, generator=g),
    }
    header = {
        "schema": 5,
        "cfg": {
            "d_model": d_model,
            "d_sae": d_sae,
            "activation": {
                "cls": "TopK",
                "params": {
                    "key": "top-k",
                    "top_k": 4,
                    "sparsity": {"cls": "NoSparsity", "params": {"key": "no-sparsity"}},
                    "aux": {"cls": "AuxK", "params": {"key": "auxk", "k_aux": 8, "alpha": 0.03125}},
                },
            },
            "reinit_blend": 0.8,
            "reinit_enc_dec_tranpose": True,
            "remove_parallel_grads": True,
            "normalize_w_dec": True,
        },
        "commit": "deadbeef",
        "lib": "0.0.0",
    }
    fpath = tmp_path / "ref_ckpt.pt"
    with open(fpath, "wb") as fd:
        fd.write(_json.dumps(header).encode() + b"\n")
        torch.save(sd, fd)

    cfg, params, state = nn.load(fpath)
    assert cfg.d_sae == d_sae
    assert isinstance(cfg.activation, modeling.TopK)
    assert cfg.activation.top_k == 4
    assert cfg.activation.aux == modeling.AuxK(k_aux=8, alpha=0.03125)

    # Forward parity vs. a straightforward torch recomputation.
    x = torch.randn(5, d_model, generator=g)
    h_t = x @ sd["W_enc"] + sd["b_enc"]
    vals, idxs = torch.topk(h_t, 4, dim=-1)
    mask = torch.zeros_like(h_t).scatter(-1, idxs, 1.0)
    f_t = mask * h_t
    x_hat_t = f_t @ sd["W_dec"] + sd["b_dec"]

    enc, _ = modeling.encode(cfg, params, state, jnp.asarray(x.numpy()), training=True)
    x_hat_j = modeling.decode(cfg, params, enc.f_x)[:, 0, :]

    # L0 parity (bitwise) and tight numeric parity.
    np.testing.assert_array_equal(
        np.asarray(enc.f_x != 0), (f_t != 0).numpy()
    )
    np.testing.assert_allclose(np.asarray(enc.f_x), f_t.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(x_hat_j), x_hat_t.numpy(), rtol=1e-4, atol=1e-4)


def test_load_legacy_schemas(tmp_path):
    torch = pytest.importorskip("torch")
    import json as _json

    d_model, d_sae = 4, 8
    g = torch.Generator().manual_seed(1)
    sd = {
        "W_dec": torch.randn(d_sae, d_model, generator=g),
        "b_dec": torch.zeros(d_model),
        "W_enc": torch.randn(d_model, d_sae, generator=g),
        "b_enc": torch.zeros(d_sae),
    }

    # Pre-schema: raw params, d_vit naming.
    pre = {"d_vit": d_model, "exp_factor": 2, "sparsity_coeff": 4e-4, "seed": 3}
    f1 = tmp_path / "pre_schema.pt"
    with open(f1, "wb") as fd:
        fd.write(_json.dumps(pre).encode() + b"\n")
        torch.save(sd, fd)
    cfg, _, _ = nn.load(f1)
    assert cfg.d_model == d_model and cfg.d_sae == d_sae
    assert isinstance(cfg.activation, modeling.Relu)

    # Schema 1, format 1A: cls names the activation.
    s1a = {"schema": 1, "cls": "TopK", "cfg": {"d_model": d_model, "d_sae": d_sae, "top_k": 3}}
    f2 = tmp_path / "schema1a.pt"
    with open(f2, "wb") as fd:
        fd.write(_json.dumps(s1a).encode() + b"\n")
        torch.save(sd, fd)
    cfg, _, _ = nn.load(f2)
    assert isinstance(cfg.activation, modeling.TopK) and cfg.activation.top_k == 3

    # Schema 2 with legacy nested sparsity dict and "kind" field name.
    s2 = {
        "schema": 2,
        "cfg": {
            "d_model": d_model,
            "d_sae": d_sae,
            "activation": {
                "cls": "Relu",
                "params": {"kind": "relu", "sparsity": {"coeff": 0.001}},
            },
        },
    }
    f3 = tmp_path / "schema2.pt"
    with open(f3, "wb") as fd:
        fd.write(_json.dumps(s2).encode() + b"\n")
        torch.save(sd, fd)
    cfg, _, _ = nn.load(f3)
    assert isinstance(cfg.activation, modeling.Relu)
    assert cfg.activation.sparsity == modeling.L1Sparsity(coeff=0.001)


def test_vmap_over_sae_sweep():
    """The whole sweep trains as one vmapped computation (the reference loops in
    Python, train.py:339-343; SURVEY.md §2.8 'model-sweep parallelism')."""
    cfg = modeling.SparseAutoencoderConfig(
        d_model=8, d_sae=16, activation=modeling.TopK(top_k=4)
    )
    n_sae = 3
    keys = jax.random.split(jax.random.key(9), n_sae)
    params_list, state_list = zip(*[modeling.init(cfg, k) for k in keys])
    stacked_params = jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)
    stacked_state = jax.tree.map(lambda *xs: jnp.stack(xs), *state_list)

    x = jax.random.normal(jax.random.key(10), (6, 8))

    def one(params, state):
        enc, st = modeling.encode(cfg, params, state, x, training=True)
        return modeling.decode(cfg, params, enc.f_x), st

    x_hats, sts = jax.vmap(one)(stacked_params, stacked_state)
    assert x_hats.shape == (n_sae, 6, 1, 8)
    # Matches the unvmapped per-SAE results.
    for i in range(n_sae):
        enc_i, _ = modeling.encode(cfg, params_list[i], state_list[i], x, training=True)
        ref = modeling.decode(cfg, params_list[i], enc_i.f_x)
        np.testing.assert_allclose(np.asarray(x_hats[i]), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_linear_bias_gradients_match_autodiff():
    """The hand-written _linear_bias VJP (d[W;b] = [x;1]^T @ dh in one
    contraction) must match autodiff of the plain x @ w + b formula for all
    three inputs — every other gradient test routes BOTH sides through the
    custom VJP, so a bwd regression would cancel out there."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(24, 16)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(16, 40)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(40,)), jnp.float32)
    ct = jnp.asarray(rng.normal(size=(24, 40)), jnp.float32)
    hi = jax.lax.Precision.HIGHEST

    def loss_custom(x, w, b):
        return jnp.sum(modeling._linear_bias(x, w, b, hi) * ct)

    def loss_plain(x, w, b):
        return jnp.sum(
            (jnp.dot(x, w, preferred_element_type=jnp.float32, precision=hi) + b)
            * ct
        )

    got = jax.grad(loss_custom, argnums=(0, 1, 2))(x, w, b)
    want = jax.grad(loss_plain, argnums=(0, 1, 2))(x, w, b)
    for g, r, name in zip(got, want, ("dx", "dw", "db")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=1e-5, atol=1e-5, err_msg=name
        )
