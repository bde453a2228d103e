# Developer task runner (capability mirror of the reference's justfile,
# adapted: no uv/elm/marimo in the toolchain; stdlib + pytest only).

# Hermetic test suite (8-device virtual CPU mesh) + regression report.
test:
    python -m pytest tests/ -q --junitxml=pytest.xml
    python scripts/regressions.py pytest.xml > REGRESSIONS.md

# Regenerate the API reference and assemble the publishable docs/ tree.
docs:
    python scripts/docs.py
    python scripts/deploy.py --skip-api

# Export the inference example as a Colab-ready notebook.
notebook:
    python scripts/export_notebook.py

# Train-step + extraction benchmarks (needs a TPU).
bench:
    python bench.py
    python scripts/bench_ablate.py
    python scripts/bench_extract.py

# End-to-end drive on the fake backends (what /verify runs).
e2e:
    python -m pytest tests/test_framework_train.py tests/test_framework_inference.py -q

clean:
    rm -f pytest.xml
    find . -type d -name __pycache__ -prune -exec rm -rf {} \;
