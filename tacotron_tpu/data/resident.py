"""Device-resident corpus training: upload the corpus to HBM once, then
assemble every training batch ON DEVICE from a tiny host index array.

Motivation (both halves measured, docs/PERF.md "Host-memory leak on the
tunneled transport" / BENCH_DETAIL ``training_live_*``):

- **Throughput**: on the tunneled dev backend the per-step wire move of a
  fresh batch dominates the step (66k frames/s live vs 500k resident-batch
  compute ceiling).  Resident batches cut per-step host->device traffic
  from ~7.4 MB (B=32 int16 waveforms) to the ~128-byte index array.
- **Host memory**: the same transport RETAINS every transfer's source
  bytes (measured 7.2 MB leaked per 7.4 MB ``device_put``, linear,
  unreclaimable by GC or ``malloc_trim``) — a fresh-batch loop OOMs a
  125 GB host at ~20k steps.  One corpus-sized upload leaks once.

Semantics: batch COMPOSITION is exactly the :class:`~.feeder.DataFeeder`
pipeline (same shuffles from the same rng stream, same ratio/greedy-phase
policy, same static shapes) run over a one-time in-memory preload; only
the materialization of the big per-example tensors (waveforms, or
mel+linear spectrograms) moves on device.  Resident mode therefore
implies ``DataConfig.pad_to_corpus_max`` padding (every example stored at
the corpus-max bucket shape so one gather serves every batch — and the
run compiles exactly ONE train program).  Equality with the host pipeline
is pinned by ``tests/test_data.py::test_resident_feeder_matches_host``.

Scope: single-process (one host) — multi-host DP shards the corpus by
files, so each host's resident store and index space would differ;
that composition is untested and guarded off.  The mesh ``data`` axis
within one process works (the jitted step reshards the gathered batch).

Reference mapping: this plays the role of the reference's FIFOQueue
enqueue thread (``/root/reference/datasets/datafeeder.py:157-167``) for
the case where the corpus fits device memory — a case the reference's
host-resident TF1 pipeline cannot exploit at all.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..config import Config
from ..train.step import Batch
from .feeder import PAD, DataFeeder, Example


class ResidentDataFeeder(DataFeeder):
    """DataFeeder whose queue carries ``(small_batch, indices)`` and whose
    big tensors are gathered from a one-time device upload.

    ``small_batch`` is a :class:`Batch` with ``mel_targets`` /
    ``linear_targets`` / ``waveforms`` set to None; ``indices`` is the
    int32 resident-store row per batch element (in final batch order).
    Call :meth:`upload` once, then :meth:`assemble` per step.
    """

    def __init__(self, data_dirs, config: Config, data_type: str = "train",
                 **kwargs):
        if data_type != "train":
            raise ValueError("ResidentDataFeeder is train-only (the test "
                             "feeder's one static batch gains nothing)")
        if kwargs.get("process_count", 1) > 1:
            raise ValueError(
                "device_resident_corpus is single-process only: multi-host "
                "DP stripes the corpus by files, so per-host stores would "
                "diverge — use the streaming DataFeeder there")
        if kwargs.get("skip_filter", False):
            raise ValueError("device_resident_corpus needs the filter scan "
                             "(it derives the store shape from the corpus "
                             "maxima); drop skip_path_filter")
        # resident storage pads every example to the corpus max, so batch
        # shapes are the corpus-max bucket -> ONE compiled train program
        config = config.replace(data=dataclasses.replace(
            config.data, pad_to_corpus_max=True))
        self._cache: Dict[str, Example] = {}
        self.examples: List[Example] = []
        super().__init__(data_dirs, config, data_type=data_type, **kwargs)

        # one-time preload: parse every scanned path with the base parser;
        # corrupt files are dropped from the path lists up front (the
        # streaming feeder skips them per epoch instead)
        for d in self.data_dirs:
            kept = []
            for path in self.path_dict[d]:
                example = DataFeeder._load_path(self, path, d)
                if example is None:
                    continue
                example.resident_index = len(self.examples)
                self.examples.append(example)
                self._cache[path] = example
                kept.append(path)
            self.path_dict[d] = kept
            if not kept:
                raise ValueError(f"no loadable .npz files in {d}")

        limit = config.train.resident_corpus_max_bytes
        if self.resident_nbytes() > limit:
            raise ValueError(
                f"resident corpus needs {self.resident_nbytes() / 2**20:.0f}"
                f" MiB padded (> resident_corpus_max_bytes = "
                f"{limit / 2**20:.0f} MiB); raise the limit if it fits "
                f"device HBM, or use the streaming DataFeeder")

    # ------------------------------------------------------------ store

    def _store_shape(self) -> Tuple[int, int]:
        """(tok_len, frame_len): the corpus-max padded bucket shape every
        example is stored (and every batch emitted) at."""
        [(tok_len, frame_len)] = self.bucket_shapes()
        return tok_len, frame_len

    def resident_nbytes(self) -> int:
        n = len(self.examples)
        _, frame_len = self._store_shape()
        if self.emit_waveforms:
            return n * (frame_len - 1) * self.config.audio.hop_length * 2
        mel_d = self.examples[0].mel.shape[1]
        lin_d = self.examples[0].linear.shape[1]
        return n * frame_len * (mel_d + lin_d) * 4

    def host_store(self) -> Dict[str, np.ndarray]:
        """The stacked, corpus-max-padded big tensors (host numpy)."""
        n = len(self.examples)
        _, frame_len = self._store_shape()
        if self.emit_waveforms:
            hop = self.config.audio.hop_length
            wavs = np.zeros((n, (frame_len - 1) * hop), np.int16)
            for e in self.examples:
                wavs[e.resident_index, :len(e.wav)] = e.wav
            return {"waveforms": wavs}
        mel = np.zeros((n, frame_len, self.examples[0].mel.shape[1]),
                       np.float32)
        linear = np.zeros((n, frame_len, self.examples[0].linear.shape[1]),
                          np.float32)
        for e in self.examples:
            mel[e.resident_index, :e.n_frames] = e.mel
            linear[e.resident_index, :e.n_frames] = e.linear
        return {"mel_targets": mel, "linear_targets": linear}

    def upload(self, plan=None) -> dict:
        """``device_put`` the store once (replicated when a mesh plan is
        given) and build the jitted row-gather; returns the device store.
        """
        import jax

        store = self.host_store()
        if plan is not None:
            repl = plan.replicated()
            store = {k: jax.device_put(v, repl) for k, v in store.items()}
        else:
            store = {k: jax.device_put(v) for k, v in store.items()}
        # the gather emits the batch already laid out the way the train
        # step wants it (sharded over the mesh data axis), so the step's
        # in_shardings see a matching committed layout
        self._gather = jax.jit(
            lambda s, idx: {k: v[idx] for k, v in s.items()},
            out_shardings=plan.batch() if plan is not None else None)
        return store

    def assemble(self, store: dict, small: Batch,
                 indices: np.ndarray) -> Batch:
        """One on-device gather -> the full :class:`Batch` for the step."""
        import jax.numpy as jnp

        big = self._gather(store, jnp.asarray(indices, jnp.int32))
        return small._replace(**big)

    # --------------------------------------------------- feeder overrides

    def _load_path(self, path: str, data_dir: str) -> Optional[Example]:
        return self._cache.get(path)

    def _prepare_batch(self, examples: List[Example]):
        """Small fields exactly as the base builds them (same single rng
        shuffle, same corpus-max static shape — kept in lockstep with
        ``DataFeeder._prepare_batch``); big tensors become indices."""
        if self.data_type == "train":
            self.rng.shuffle(examples)
        tok_len, frame_len = self._store_shape()

        n = len(examples)
        inputs = np.full((n, tok_len), PAD, np.int32)
        input_lengths = np.zeros((n,), np.int32)
        loss_coeff = np.zeros((n,), np.float32)
        speaker = np.zeros((n,), np.int32)
        target_lengths = np.zeros((n,), np.int32)
        indices = np.zeros((n,), np.int32)
        for i, e in enumerate(examples):
            inputs[i, :len(e.tokens)] = e.tokens
            input_lengths[i] = len(e.tokens)
            loss_coeff[i] = e.loss_coeff
            speaker[i] = e.speaker_id
            target_lengths[i] = e.n_frames
            indices[i] = e.resident_index
        small = Batch(inputs=inputs, input_lengths=input_lengths,
                      loss_coeff=loss_coeff, mel_targets=None,
                      linear_targets=None, speaker_id=speaker,
                      target_lengths=target_lengths, waveforms=None)
        return small, indices
