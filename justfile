# Developer task runner (capability mirror of the reference's justfile,
# adapted: no uv/elm/marimo in the toolchain; stdlib + pytest only).

# Hermetic test suite (8-device virtual CPU mesh) + regression report.
test:
    python -m pytest tests/ -q --junitxml=pytest.xml
    python scripts/regressions.py pytest.xml > REGRESSIONS.md

# Same suite under the PEP 669 line-coverage collector; publishes coverage
# into REGRESSIONS.md (scope: the whole framework + contrib + scripts).
coverage:
    python scripts/smallcov.py --out coverage.json \
        --include saev_tpu contrib scripts launch.py \
        -- -m pytest tests/ -q --junitxml=pytest.xml
    python scripts/regressions.py pytest.xml coverage.json > REGRESSIONS.md

# Regenerate the API reference and assemble the publishable docs/ tree.
docs:
    python scripts/docs.py
    python scripts/deploy.py --skip-api

# Export the inference example as a Colab-ready notebook.
notebook:
    python scripts/export_notebook.py

# Train-step + extraction benchmarks (needs a TPU). bench.py runs the
# Pallas-vs-XLA kernel parity check first and embeds the verdict.
bench:
    python bench.py
    python scripts/bench_ablate.py
    python scripts/bench_extract.py

# Sweep-axis scaling (n_sae 1..8) with Mosaic-kernel verification (needs a TPU).
bench-sweep:
    python scripts/bench_sweep.py

# On-TPU Pallas kernel numeric parity, full shapes (needs a TPU).
kernel-check:
    python scripts/check_tpu_kernels.py

# Loader-only thread-scaling measurement (CPU).
bench-loader:
    python scripts/bench_loader_threads.py --gb 2.5 --uncap --trials 3

# End-to-end drive on the fake backends (what /verify runs).
e2e:
    python -m pytest tests/test_framework_train.py tests/test_framework_inference.py -q

clean:
    rm -f pytest.xml
    find . -type d -name __pycache__ -prune -exec rm -rf {} \;
