"""Vendored miniature models — pure-numpy, deterministic, no model-lib
dependencies. These exist to exercise the REAL-model serving code paths
(per-executor weight residency, Arrow-batched vectorized inference,
backend registry dispatch) in environments where torch/onnxruntime/
sentence-transformers cannot be installed (MODELS_E2E.json records that
state honestly for the gated backends)."""
