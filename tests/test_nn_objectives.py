"""Tests for the Matryoshka objective (mirrors reference tests/test_nn_objectives.py
and test_auxk.py coverage)."""

import numpy as np

import jax
import jax.numpy as jnp

from saev_tpu.nn import modeling, objectives


def make_sae(d_model=8, d_sae=32, activation=None):
    cfg = modeling.SparseAutoencoderConfig(
        d_model=d_model, d_sae=d_sae, activation=activation or modeling.TopK(top_k=4)
    )
    params, state = modeling.init(cfg, jax.random.key(0))
    return cfg, params, state


def test_sample_prefixes_properties():
    rng = np.random.default_rng(0)
    for _ in range(20):
        p = objectives.sample_prefixes(64, 10, rng=rng)
        assert p.shape == (10,)
        assert p[-1] == 64
        assert (np.diff(p) > 0).all()
        assert p[0] >= 1
    # n_prefixes=1 -> just [d_sae]
    np.testing.assert_array_equal(objectives.sample_prefixes(64, 1), [64])


def test_sample_prefixes_favors_short():
    rng = np.random.default_rng(1)
    samples = np.concatenate([
        objectives.sample_prefixes(1024, 10, rng=rng)[:-1] for _ in range(200)
    ])
    # Pareto(0.5) puts most mass on short prefixes.
    assert np.median(samples) < 1024 / 2


def test_scale_stabilized_mse_matches_plain_mse():
    x = jax.random.normal(jax.random.key(1), (5, 8))
    x_hat = x + 0.1
    out = objectives.scale_stabilized_mse(x_hat, x)
    np.testing.assert_allclose(np.asarray(out), 0.01, rtol=1e-4)


def test_scale_stabilized_mse_large_values():
    # Stable under large magnitudes (the point of the upper normalization).
    x = jnp.full((4, 4), 1e18)
    x_hat = jnp.full((4, 4), 1.5e18)
    out = objectives.scale_stabilized_mse(x_hat, x)
    np.testing.assert_allclose(np.asarray(out), 0.25e36, rtol=1e-5)


def test_matryoshka_loss_values():
    cfg, params, state = make_sae()
    obj_cfg = objectives.Matryoshka(n_prefixes=4)
    obj_state = objectives.init_state(cfg)
    x = jax.random.normal(jax.random.key(2), (16, 8))
    prefixes = jnp.asarray(objectives.sample_prefixes(32, 4, rng=np.random.default_rng(0)))

    loss, out, sae_st, obj_st = objectives.matryoshka_loss(
        obj_cfg, cfg, params, state, obj_state, x, prefixes, training=True
    )
    assert float(loss.l0) == 4.0  # TopK k=4
    assert float(loss.mse) > 0
    assert float(loss.aux) == 0.0  # no dead latents yet
    assert int(loss.n_dead) == 0
    # Fused training path carries only the FULL reconstruction (stop-grad);
    # eval mode returns all prefixes (asserted in
    # test_fused_training_matches_decode below).
    assert out.x_hats.shape == (16, 1, 8)
    assert np.isfinite(float(loss.loss))
    # Counter: inactive latents incremented by bsz, active reset to zero.
    toks = np.asarray(obj_st["toks_since_active"])
    fired = np.asarray((jnp.abs(out.f_x) > 0).any(axis=0))
    assert (toks[fired] == 0).all()
    assert (toks[~fired] == 16).all()


def test_matryoshka_loss_eval_mode_no_state_update():
    cfg, params, state = make_sae()
    obj_cfg = objectives.Matryoshka(n_prefixes=2)
    obj_state = {"toks_since_active": jnp.full((32,), 100, dtype=jnp.int32)}
    x = jax.random.normal(jax.random.key(3), (8, 8))
    prefixes = jnp.array([5, 32], dtype=jnp.int32)
    loss, out, sae_st, obj_st = objectives.matryoshka_loss(
        obj_cfg, cfg, params, state, obj_state, x, prefixes, training=False
    )
    np.testing.assert_array_equal(
        np.asarray(obj_st["toks_since_active"]), np.asarray(obj_state["toks_since_active"])
    )
    assert float(loss.aux) == 0.0
    assert int(loss.n_dead) == 0


def test_dead_mask_threshold():
    cfg, params, state = make_sae()
    obj_cfg = objectives.Matryoshka(n_prefixes=2, dead_threshold_tokens=20)
    # Counters just under the threshold: one batch of 16 pushes inactive ones over.
    obj_state = {"toks_since_active": jnp.full((32,), 10, dtype=jnp.int32)}
    x = jax.random.normal(jax.random.key(4), (16, 8))
    prefixes = jnp.array([5, 32], dtype=jnp.int32)
    loss, out, _, obj_st = objectives.matryoshka_loss(
        obj_cfg, cfg, params, state, obj_state, x, prefixes, training=True
    )
    fired = np.asarray((jnp.abs(out.f_x) > 0).any(axis=0))
    assert int(loss.n_dead) == int((~fired).sum())
    if int(loss.n_dead) > 0:
        assert float(loss.aux) > 0


def test_aux_loss_gradients_only_to_dead_latents():
    d_model, d_sae = 8, 16
    cfg = modeling.SparseAutoencoderConfig(
        d_model=d_model, d_sae=d_sae, activation=modeling.TopK(top_k=2, aux=modeling.AuxK(k_aux=4, alpha=1.0))
    )
    params, _ = modeling.init(cfg, jax.random.key(5))
    x = jax.random.normal(jax.random.key(6), (8, d_model))
    dead_mask = jnp.zeros((d_sae,), dtype=bool).at[:4].set(True)

    def aux_only(params):
        enc_h = x @ params["W_enc"] + params["b_enc"]
        x_hat = jnp.zeros_like(x)
        return objectives._aux_loss(
            cfg.activation.aux, cfg, params, x, enc_h, x_hat, dead_mask
        )

    g = jax.grad(aux_only)(params)
    g_wdec = np.asarray(g["W_dec"])
    # Decoder gradient lands only on dead-latent rows (aux acts are zero elsewhere).
    assert np.abs(g_wdec[:4]).sum() > 0
    np.testing.assert_allclose(g_wdec[4:], 0.0, atol=1e-7)


def test_aux_loss_zero_when_no_dead():
    cfg, params, _ = make_sae(d_sae=16)
    x = jax.random.normal(jax.random.key(7), (4, 8))
    h = x @ params["W_enc"] + params["b_enc"]
    dead_mask = jnp.zeros((16,), dtype=bool)
    out = objectives._aux_loss(
        modeling.AuxK(k_aux=4), cfg, params, x, h, jnp.zeros_like(x), dead_mask
    )
    assert float(out) == 0.0


def test_aux_loss_fewer_dead_than_k_aux():
    """n_dead < k_aux: all dead latents participate (reference k_use=min(k_aux, n_dead))."""
    d_model, d_sae = 4, 8
    cfg = modeling.SparseAutoencoderConfig(
        d_model=d_model, d_sae=d_sae, activation=modeling.TopK(top_k=2)
    )
    params, _ = modeling.init(cfg, jax.random.key(8))
    x = jax.random.normal(jax.random.key(9), (4, d_model))
    h = x @ params["W_enc"] + params["b_enc"]
    dead_mask = jnp.zeros((d_sae,), dtype=bool).at[jnp.array([1, 5])].set(True)
    aux_cfg = modeling.AuxK(k_aux=4, alpha=1.0)
    got = objectives._aux_loss(aux_cfg, cfg, params, x, h, jnp.zeros_like(x), dead_mask)
    # Naive recomputation: aux acts = h on the two dead latents.
    aux_acts = np.zeros_like(np.asarray(h))
    aux_acts[:, [1, 5]] = np.asarray(h)[:, [1, 5]]
    recon = aux_acts @ np.asarray(params["W_dec"]) + np.asarray(params["b_dec"])
    residual = np.asarray(x)  # x_hat_full = 0
    expected = np.mean((recon - residual) ** 2)
    np.testing.assert_allclose(float(got), expected, rtol=1e-5)


def test_loss_total_is_mse_plus_sparsity_plus_aux():
    cfg, params, state = make_sae(activation=modeling.Relu())
    obj_cfg = objectives.Matryoshka(n_prefixes=3)
    obj_state = objectives.init_state(cfg)
    x = jax.random.normal(jax.random.key(10), (8, 8))
    prefixes = jnp.array([4, 12, 32], dtype=jnp.int32)
    loss, *_ = objectives.matryoshka_loss(
        obj_cfg, cfg, params, state, obj_state, x, prefixes, training=True
    )
    np.testing.assert_allclose(
        float(loss.loss), float(loss.mse) + float(loss.sparsity) + float(loss.aux), rtol=1e-6
    )
    # ReLU + L1Sparsity: sparsity = coeff * l1.
    np.testing.assert_allclose(
        float(loss.sparsity), 4e-4 * float(loss.l1), rtol=1e-5
    )


def test_matryoshka_loss_jits_and_grads():
    cfg, params, state = make_sae()
    obj_cfg = objectives.Matryoshka(n_prefixes=4)
    obj_state = objectives.init_state(cfg)
    x = jax.random.normal(jax.random.key(11), (8, 8))
    prefixes = jnp.asarray(objectives.sample_prefixes(32, 4, rng=np.random.default_rng(1)))

    @jax.jit
    def step(params, sae_state, obj_state, x, prefixes):
        def loss_fn(params):
            loss, out, s1, s2 = objectives.matryoshka_loss(
                obj_cfg, cfg, params, sae_state, obj_state, x, prefixes, training=True
            )
            return loss.loss, (loss, s1, s2)

        (total, (loss, s1, s2)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return total, grads, s1, s2

    total, grads, s1, s2 = step(params, state, obj_state, x, prefixes)
    assert np.isfinite(float(total))
    for k, v in grads.items():
        assert np.isfinite(np.asarray(v)).all(), k


def test_fused_training_matches_decode():
    """The fused prefix-MSE (custom VJP, ops/matryoshka.py) must agree with
    the autodiff decode path: same loss and ~f32-level gradient agreement on
    CPU (where both run the f32 XLA algebra)."""
    cfg = modeling.SparseAutoencoderConfig(
        d_model=8, d_sae=32, activation=modeling.TopK(top_k=4)
    )
    params, state = modeling.init(cfg, jax.random.key(0))
    obj_cfg = objectives.Matryoshka(n_prefixes=4)
    obj_state = objectives.init_state(cfg)
    x = jax.random.normal(jax.random.key(2), (16, 8))
    prefixes = jnp.asarray(
        objectives.sample_prefixes(32, 4, rng=np.random.default_rng(0))
    )

    def loss_at(p, training):
        loss, out, _, _ = objectives.matryoshka_loss(
            obj_cfg, cfg, p, state, obj_state, x, prefixes, training=training
        )
        return loss.mse, out

    # Eval mode keeps the full multi-prefix decode.
    mse_eval, out_eval = loss_at(params, training=False)
    assert out_eval.x_hats.shape == (16, 4, 8)
    mse_train, out_train = loss_at(params, training=True)
    np.testing.assert_allclose(float(mse_train), float(mse_eval), rtol=1e-5)
    # Full reconstruction agrees between paths.
    np.testing.assert_allclose(
        np.asarray(out_train.x_hats[:, 0, :]),
        np.asarray(out_eval.x_hats[:, -1, :]),
        rtol=1e-5, atol=1e-6,
    )

    # Gradients: fused custom VJP vs autodiff through decode.
    def train_scalar(p):
        return loss_at(p, training=True)[0]

    def eval_scalar(p):
        return loss_at(p, training=False)[0]

    g_t = jax.grad(train_scalar)(params)
    g_e = jax.grad(eval_scalar)(params)
    for key in ("W_dec", "b_dec"):
        a, b = np.asarray(g_t[key]), np.asarray(g_e[key])
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
    # Encoder grads flow through f_x; compare those too.
    for key in ("W_enc", "b_enc"):
        a, b = np.asarray(g_t[key]), np.asarray(g_e[key])
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_any_dead_cond_gates_aux():
    """The any_dead lax.cond must (a) skip aux exactly when False, (b) match
    the ungated computation when True — values AND gradients (the reference
    skips all AuxK work when no latent is dead, modeling.py:94-96)."""
    cfg = modeling.SparseAutoencoderConfig(
        d_model=8, d_sae=32, activation=modeling.TopK(top_k=4)
    )
    params, state = modeling.init(cfg, jax.random.key(0))
    obj_cfg = objectives.Matryoshka(n_prefixes=3, dead_threshold_tokens=100)
    x = jax.random.normal(jax.random.key(2), (16, 8))
    prefixes = jnp.asarray([5, 17, 32], jnp.int32)
    # 6 latents past the threshold -> dead after the update.
    toks = np.zeros(32, np.int32)
    toks[:6] = 200
    obj_state = {"toks_since_active": jnp.asarray(toks)}
    # Pin those latents inactive so they stay dead through the update.
    params = {**params, "b_enc": params["b_enc"].at[:6].set(-1e6)}

    def run(any_dead, p):
        loss, _, _, _ = objectives.matryoshka_loss(
            obj_cfg, cfg, p, state, obj_state, x, prefixes,
            training=True, any_dead=any_dead,
        )
        return loss

    # Gated-True matches ungated (None).
    l_true = run(jnp.asarray(True), params)
    l_none = objectives.matryoshka_loss(
        obj_cfg, cfg, params, state, obj_state, x, prefixes, training=True
    )[0]
    assert float(l_true.aux) > 0
    np.testing.assert_allclose(float(l_true.aux), float(l_none.aux), rtol=1e-6)
    g_true = jax.grad(lambda p: run(jnp.asarray(True), p).loss)(params)
    g_none = jax.grad(
        lambda p: objectives.matryoshka_loss(
            obj_cfg, cfg, p, state, obj_state, x, prefixes, training=True
        )[0].loss
    )(params)
    for k in g_true:
        np.testing.assert_allclose(
            np.asarray(g_true[k]), np.asarray(g_none[k]), rtol=1e-6, atol=1e-7
        )

    # Gated-False: aux is exactly zero and contributes no gradient.
    l_false = run(jnp.asarray(False), params)
    assert float(l_false.aux) == 0.0
    np.testing.assert_allclose(float(l_false.mse), float(l_true.mse), rtol=1e-6)


def test_train_step_skips_aux_only_when_none_can_be_dead():
    """Aux loss values through the full train step: zero for every SAE when no
    latent is dead, and per-SAE (only the SAE with dead latents pays) when the
    sweep is mixed — the invariants the static warm-up/full step split
    (train.py aux_from_step) relies on."""
    from saev_tpu.framework import train as train_mod

    cfg = modeling.SparseAutoencoderConfig(
        d_model=8, d_sae=32, activation=modeling.TopK(top_k=4)
    )
    obj_cfg = objectives.Matryoshka(n_prefixes=3, dead_threshold_tokens=100)
    stack = lambda trees: jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
    inits = [modeling.init(cfg, jax.random.key(i)) for i in range(2)]
    params = stack([p for p, _ in inits])
    params = {**params, "b_enc": params["b_enc"].at[:, :6].set(-1e6)}
    x = np.asarray(jax.random.normal(jax.random.key(3), (16, 8)), np.float32)

    def run_step(toks0):
        obj_state = stack([
            {"toks_since_active": jnp.asarray(toks0[i])} for i in range(2)
        ])
        p = jax.tree.map(jnp.copy, params)  # the jitted step donates its state
        ts = train_mod.SweepState(
            params=p,
            sae_state=stack([s for _, s in inits]),
            obj_state=obj_state,
            opt_state=train_mod._adam_init(p),
            step=jnp.zeros((), jnp.int32),
        )
        hp = {
            "lr": jnp.full((2,), 1e-4, jnp.float32),
            "n_lr_warmup": jnp.full((2,), 5.0, jnp.float32),
            "grad_clip": jnp.ones((2,), jnp.float32),
            "sparsity_coeff": jnp.zeros((2,), jnp.float32),
            "aux_alpha": jnp.full((2,), 1 / 32, jnp.float32),
            "momentum": jnp.zeros((2,), jnp.float32),
        }
        step = train_mod.make_train_step(cfg, obj_cfg, n_steps=10, optim="adam")
        pfx = jnp.tile(jnp.asarray([[5, 17, 32]], jnp.int32), (2, 1))
        _, stats = step(ts, jnp.asarray(x), pfx, hp)
        return stats

    fresh = np.zeros((2, 32), np.int32)
    stats = run_step(fresh)
    assert np.asarray(stats["aux"]).tolist() == [0.0, 0.0]

    # Only SAE 0 has dead-eligible latents: its aux fires, SAE 1's stays 0.
    mixed = np.zeros((2, 32), np.int32)
    mixed[0, :6] = 200
    stats = run_step(mixed)
    aux = np.asarray(stats["aux"])
    assert aux[0] > 0 and aux[1] == 0.0


def _subspace_setup(n_dead: int, d_sae: int = 64, k_aux: int = 4):
    """SAE with exactly n_dead latents pinned dead (saturated counters +
    encoder bias at -1e6 so they never fire and stay dead through the
    counter update)."""
    cfg = modeling.SparseAutoencoderConfig(
        d_model=8, d_sae=d_sae,
        activation=modeling.TopK(top_k=4, aux=modeling.AuxK(k_aux=k_aux, alpha=1.0)),
    )
    params, state = modeling.init(cfg, jax.random.key(0))
    obj_cfg = objectives.Matryoshka(n_prefixes=3, dead_threshold_tokens=100)
    x = jax.random.normal(jax.random.key(2), (16, 8))
    prefixes = jnp.asarray([5, 17, d_sae], jnp.int32)
    toks = np.zeros(d_sae, np.int32)
    # Scatter the dead set (not a contiguous block) so the gather is exercised.
    dead_cols = np.random.default_rng(3).choice(d_sae, size=n_dead, replace=False)
    toks[dead_cols] = 200
    obj_state = {"toks_since_active": jnp.asarray(toks)}
    if n_dead:
        params = {
            **params,
            "b_enc": params["b_enc"].at[jnp.asarray(dead_cols)].set(-1e6),
        }
    return cfg, obj_cfg, params, state, obj_state, x, prefixes


def _loss_and_grads(cfg, obj_cfg, params, state, obj_state, x, prefixes, cap):
    def scalar(p):
        loss, _, _, _ = objectives.matryoshka_loss(
            obj_cfg, cfg, p, state, obj_state, x, prefixes,
            training=True, aux_subspace_cap=cap,
        )
        return loss.loss, loss

    (_, loss), g = jax.value_and_grad(scalar, has_aux=True)(params)
    return loss, g


def test_aux_subspace_matches_dense():
    """Dead-subspace AuxK == dense AuxK (loss AND all gradients) whenever
    n_dead <= cap: below k_aux, above k_aux, and exactly at the cap."""
    for n_dead in (2, 12, 16):
        cfg, obj_cfg, params, state, obj_state, x, prefixes = _subspace_setup(
            n_dead
        )
        l_dense, g_dense = _loss_and_grads(
            cfg, obj_cfg, params, state, obj_state, x, prefixes, cap=None
        )
        l_sub, g_sub = _loss_and_grads(
            cfg, obj_cfg, params, state, obj_state, x, prefixes, cap=16
        )
        assert float(l_dense.aux) > 0, n_dead
        np.testing.assert_allclose(
            float(l_sub.aux), float(l_dense.aux), rtol=1e-6, err_msg=f"n_dead={n_dead}"
        )
        np.testing.assert_allclose(
            float(l_sub.loss), float(l_dense.loss), rtol=1e-6
        )
        for k in g_dense:
            # rtol 5e-5: the subspace recomputes h on the gathered columns, so
            # f32 summation order differs from the shared encode matmul; the
            # -1e6 dead-pinning bias makes |h|~1e6 on those columns and
            # amplifies that last-ulp difference through the quadratic loss.
            np.testing.assert_allclose(
                np.asarray(g_sub[k]), np.asarray(g_dense[k]),
                rtol=5e-5, atol=1e-7, err_msg=f"n_dead={n_dead} grad {k}",
            )


def test_aux_subspace_no_dead_is_zero():
    cfg, obj_cfg, params, state, obj_state, x, prefixes = _subspace_setup(0)
    l_sub, _ = _loss_and_grads(
        cfg, obj_cfg, params, state, obj_state, x, prefixes, cap=16
    )
    assert float(l_sub.aux) == 0.0


def test_aux_subspace_cap_at_d_sae_is_dense():
    """cap >= d_sae routes to the plain dense path (no gather)."""
    cfg, obj_cfg, params, state, obj_state, x, prefixes = _subspace_setup(12)
    l_dense, _ = _loss_and_grads(
        cfg, obj_cfg, params, state, obj_state, x, prefixes, cap=None
    )
    l_cap, _ = _loss_and_grads(
        cfg, obj_cfg, params, state, obj_state, x, prefixes, cap=64
    )
    np.testing.assert_allclose(float(l_cap.aux), float(l_dense.aux), rtol=1e-7)


def test_default_subspace_cap():
    # Production shape: a quarter of the dictionary.
    assert objectives.default_subspace_cap(16384, 512) == 4096
    # Lane-aligned, at least 4x k_aux, never above d_sae.
    assert objectives.default_subspace_cap(16384, 2048) == 8192
    assert objectives.default_subspace_cap(1000, 100) == 400 - 400 % 128 + (128 if 400 % 128 else 0)
    assert objectives.default_subspace_cap(64, 512) == 64
    cap = objectives.default_subspace_cap(4096, 100)
    assert cap % 128 == 0 and cap <= 4096


def test_subspace_cap_ladder():
    # Production shape: tight rung d_sae/16, wide rung d_sae/4, ascending.
    assert objectives.subspace_cap_ladder(16384, 512) == [1024, 4096]
    # Tiny dictionaries where no cap < d_sae: empty ladder (dense only).
    assert objectives.subspace_cap_ladder(64, 512) == []
    for d_sae, k_aux in ((16384, 512), (8192, 64), (4096, 2048)):
        ladder = objectives.subspace_cap_ladder(d_sae, k_aux)
        assert ladder == sorted(set(ladder))
        for c in ladder:
            assert c % 128 == 0 and 2 * min(k_aux, c) <= 2 * c and c < d_sae


def test_aux_risk_stat_bounds_future_n_dead():
    """stats['aux_risk'] from step i must upper-bound n_dead at steps i+1 and
    i+2 (the routing contract of the three-variant train loop)."""
    from saev_tpu.framework import train as train_mod

    cfg = modeling.SparseAutoencoderConfig(
        d_model=8, d_sae=32,
        activation=modeling.TopK(top_k=4, aux=modeling.AuxK(k_aux=4, alpha=1.0)),
    )
    obj_cfg = objectives.Matryoshka(n_prefixes=2, dead_threshold_tokens=64)
    params, state = modeling.init(cfg, jax.random.key(0))
    # 5 latents already close to the threshold, pinned inactive.
    toks = np.zeros(32, np.int32)
    toks[:5] = 40
    params = {**params, "b_enc": params["b_enc"].at[:5].set(-1e6)}
    stack = lambda t: jax.tree.map(lambda a: jnp.asarray(a)[None], t)
    ts = train_mod.SweepState(
        params=stack(params),
        sae_state=stack(state),
        obj_state=stack({"toks_since_active": jnp.asarray(toks)}),
        opt_state=train_mod._adam_init(stack(params)),
        step=jnp.zeros((), jnp.int32),
    )
    hp = {
        "lr": jnp.full((1,), 1e-4, jnp.float32),
        "n_lr_warmup": jnp.zeros((1,), jnp.float32),
        "grad_clip": jnp.ones((1,), jnp.float32),
        "sparsity_coeff": jnp.zeros((1,), jnp.float32),
        "aux_alpha": jnp.full((1,), 1.0, jnp.float32),
        "momentum": jnp.zeros((1,), jnp.float32),
    }
    step = train_mod.make_train_step(cfg, obj_cfg, n_steps=10, optim="adam")
    rng = np.random.default_rng(0)
    pfx = jnp.asarray([[7, 32]], jnp.int32)
    risks, n_deads = [], []
    for i in range(5):
        x = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))
        ts, stats = step(ts, x, pfx, hp)
        risks.append(int(stats["aux_risk"][0]))
        n_deads.append(int(stats["n_dead"][0]))
    assert max(n_deads) > 0  # the pinned latents do die during the run
    for i in range(len(risks)):
        for h in (1, 2):
            if i + h < len(n_deads):
                assert n_deads[i + h] <= risks[i], (i, h, n_deads, risks)


def test_step_fn_routing_warm_sub_dense():
    """step_fn_at routes warm -> subspace/dense on the lagged risk bound."""
    from saev_tpu.framework import train as train_mod

    calls = []
    mk = lambda tag: (lambda *a: calls.append(tag))
    rt = train_mod._CohortRuntime(
        cohort=None, ts=None, step_fn=mk("dense"), metrics_fn=None, hp=None,
        prefix_rng=None, step_fn_warm=mk("warm"), aux_from_step=3,
        step_fn_subs=[(8, mk("sub8")), (16, mk("sub16"))],
        pending=[], risk=[None],
    )
    # Warm phase.
    rt.step_fn_at(0)()
    assert calls[-1] == "warm"
    # Past warm-up with no proven bound yet: dense.
    rt.step_fn_at(3)()
    assert calls[-1] == "dense"
    # A lagged stat proving risk <= cap routes to the tightest sufficient
    # subspace rung; a stat younger than the horizon must NOT be consumed.
    rt.record_stats(3, {"aux_risk": np.asarray([5])})
    rt.step_fn_at(4)()
    assert calls[-1] == "dense" and rt.pending
    rt.step_fn_at(5)()
    assert calls[-1] == "sub8" and not rt.pending
    # Risk between the rungs picks the wide rung; above all rungs -> dense.
    rt.record_stats(5, {"aux_risk": np.asarray([9])})
    rt.step_fn_at(7)()
    assert calls[-1] == "sub16"
    rt.record_stats(7, {"aux_risk": np.asarray([17])})
    rt.step_fn_at(9)()
    assert calls[-1] == "dense"
    # Warm-phase stats older than aux_from_step - horizon are not recorded.
    rt2 = rt._replace(pending=[], risk=[None], aux_from_step=100)
    rt2.record_stats(0, {"aux_risk": np.asarray([0])})
    assert not rt2.pending
    rt2.record_stats(98, {"aux_risk": np.asarray([0])})
    assert rt2.pending
