"""saev-tpu: a TPU-native (JAX/XLA/Pallas) framework for training sparse autoencoders
on vision-transformer activations.

Re-designed from scratch for TPU hardware with the same capabilities as the reference
PyTorch framework (OSU-NLP-Group/saev):

1. **Extract**: run a frozen ViT over an image/audio dataset as a jitted JAX forward
   with functional activation taps, and stream residual activations into
   content-addressed binary shards on disk (`saev_tpu.data.shards`).
2. **Train**: stream shards back through a host-threaded shuffled dataloader with
   reservoir sampling and device prefetch, and train many SAEs in parallel on the
   same batch via a single `vmap`-over-sweep + `shard_map`-over-data jitted train
   step (`saev_tpu.framework.train`).
3. **Infer/interpret**: ordered pass dumping sparse token activations, per-latent
   statistics and reconstruction metrics (`saev_tpu.framework.inference`), plus
   patch heatmap visualization (`saev_tpu.viz`).
"""

__version__ = "0.1.0"
