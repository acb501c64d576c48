#!/usr/bin/env python3
"""Measure the demo server under real concurrent load on the real chip.

Round-4 shipped dynamic request batching in ``app.py`` (SynthWorker
coalesces concurrent simple requests into one batched decode) with the
claim "under load each requester sees ~batch-1 latency instead of a
serial queue" — but the claim was only mechanism-tested against a fake
synthesizer.  This script drives the REAL ``SynthWorker`` + HTTP server
(the exact ``app.py`` plumbing: ThreadingHTTPServer handlers submitting
to the main-thread TPU worker) with N concurrent closed-loop clients and
records per-request p50/p95 latency, throughput, and the observed
``batched_calls`` — then repeats with ``max_batch=1`` (coalescing off,
the reference's serial-Flask-handler behavior,
``/root/reference/app.py:91-99``) for the A/B.

Texts are unique per request so the md5 wav cache never hits; all texts
share one token bucket so the comparison isolates scheduling, not shape
churn.  Used standalone (writes ``docs/SERVING_LOAD.json``) and from
``bench.py`` (the ``serving_concurrent_*`` block in BENCH_DETAIL).

Run on the TPU host::

    python scripts/serving_load.py --out docs/SERVING_LOAD.json
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import tempfile
import threading
import time
import urllib.parse
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _drive_level(worker, port: int, level: int, total: int,
                 counter) -> dict:
    """One closed-loop load level: ``level`` client threads issue
    ``total`` requests between them (each sends its next request as soon
    as the previous response lands), while THIS thread pumps the worker —
    synthesis must stay on the main thread (TPU runtimes reject execution
    from handler threads; see SynthWorker docstring)."""
    per_client = total // level
    total = per_client * level
    latencies: list = []
    end_times: list = []
    lock = threading.Lock()
    barrier = threading.Barrier(level + 1)
    errors: list = []

    def client():
        try:
            barrier.wait()
            for _ in range(per_client):
                i = next(counter)
                text = urllib.parse.quote(
                    f"안녕하세요 순번 {i}번 문장입니다")
                t0 = time.perf_counter()
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/generate?text={text}"
                        f"&speaker_id=0", timeout=600) as resp:
                    body = resp.read()
                    assert resp.status == 200 and body, resp.status
                t1 = time.perf_counter()
                with lock:
                    latencies.append(t1 - t0)
                    end_times.append(t1)
        except Exception as e:  # noqa: BLE001 — recorded, fails the level
            with lock:
                errors.append(repr(e))

    threads = [threading.Thread(target=client) for _ in range(level)]
    for t in threads:
        t.start()
    bc0 = worker.batched_calls

    def waker():
        for t in threads:
            t.join()
        worker.jobs.put(("job", lambda: None))  # unblock the pump

    threading.Thread(target=waker, daemon=True).start()
    barrier.wait()
    t_start = time.perf_counter()
    while any(t.is_alive() for t in threads) or not worker.jobs.empty():
        worker.run_once()
    for t in threads:
        t.join()
    if errors:
        raise RuntimeError(f"load level {level}: {errors[:3]}")
    wall = max(end_times) - t_start
    lat_ms = np.asarray(sorted(latencies)) * 1e3
    return {
        "concurrency": level,
        "requests": total,
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 1),
        "p95_ms": round(float(np.percentile(lat_ms, 95)), 1),
        "mean_ms": round(float(lat_ms.mean()), 1),
        "throughput_rps": round(total / wall, 2),
        "batched_calls": worker.batched_calls - bc0,
        "max_batch": worker.max_batch,
    }


def run_load_test(synth, levels=(1, 2, 4, 8), requests_per_level: int = 16,
                  max_batches=(4, 1), prewarm: bool = True) -> dict:
    """Drive the real app plumbing at each (max_batch, concurrency) point.

    MUST be called from the main thread (it pumps the TPU worker).
    Returns ``{"levels": [row, ...], "note": ...}`` with one row per
    point; rows with ``max_batch=1`` are the coalescing-off A/B arm.
    """
    import app as app_module

    if prewarm:
        # the load texts run 40-50 tokens -> the 64-token bucket; prewarm
        # 32 too so the warm set matches app.py's own short-text rungs
        synth.prewarm(token_buckets=(32, 64), batch_sizes=(1, 2, 4),
                      fast_vocoder=True)
    worker = app_module.SynthWorker(synth, max_batch=max(max_batches))
    cache_dir = tempfile.mkdtemp(prefix="serving_load_")
    handler_cls = app_module.make_handler(worker, cache_dir, "load")
    handler_cls.log_message = lambda *a, **k: None  # hundreds of requests
    server = ThreadingHTTPServer(("127.0.0.1", 0), handler_cls)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    counter = itertools.count()
    rows = []
    try:
        for mb in max_batches:
            worker.max_batch = mb
            for level in levels:
                row = _drive_level(worker, port, level,
                                   requests_per_level, counter)
                rows.append(row)
                print(f"[*] max_batch={mb} N={level}: "
                      f"p50 {row['p50_ms']:.0f} ms, "
                      f"p95 {row['p95_ms']:.0f} ms, "
                      f"{row['throughput_rps']:.2f} req/s, "
                      f"batched_calls {row['batched_calls']}")
    finally:
        server.shutdown()
    return {"levels": rows}


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--load_path", default=None)
    parser.add_argument("--levels", default="1,2,4,8")
    parser.add_argument("--requests_per_level", type=int, default=16)
    parser.add_argument("--out", default="docs/SERVING_LOAD.json")
    args = parser.parse_args()

    import tacotron_tpu
    tacotron_tpu.enable_compilation_cache()
    import jax

    from tacotron_tpu.config import Config
    from tacotron_tpu.synth import Synthesizer

    synth = Synthesizer()
    if args.load_path:
        synth.load(args.load_path)
    else:
        synth.init_random(Config())

    levels = tuple(int(x) for x in args.levels.split(","))
    report = run_load_test(synth, levels=levels,
                           requests_per_level=args.requests_per_level)
    report["device"] = str(jax.devices()[0])
    report["model"] = args.load_path or "random_init"
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=2)
    print(f"[*] wrote {args.out}")


if __name__ == "__main__":
    main()
