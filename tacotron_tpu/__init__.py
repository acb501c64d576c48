"""TPU-native multi-speaker Tacotron TTS framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``GSByeon/multi-speaker-tacotron-tensorflow`` (mounted read-only at
``/root/reference``): Tacotron with CBHG encoder/post-net, Deep Voice 2
multi-speaker conditioning, a Korean-first text frontend, spectrogram data
pipeline, Griffin-Lim vocoding, training/serving drivers — built TPU-first
(pjit/shard_map over a device mesh, ``lax.scan`` decoding, on-chip DSP).
"""

__version__ = "0.1.0"


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache so serving/training CLIs
    pay each program's XLA compile once per machine, not once per process."""
    import os

    import jax

    path = cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "tacotron_tpu_xla")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from .config import (AudioConfig, Config, DataConfig, MeshConfig, ModelConfig,
                     TrainConfig, load_config, save_config, tune_scan_unroll)

__all__ = [
    "AudioConfig", "Config", "DataConfig", "MeshConfig", "ModelConfig",
    "TrainConfig", "load_config", "save_config", "tune_scan_unroll",
    "__version__",
]
