"""Serving latency: single-utterance transcribe path on the local accelerator.

Measures the on-device portion (STFT -> DS2 forward -> greedy collapse) for
one 10s utterance with the flagship model, via the N-rep difference trick
(see bench.py for why naive timing is impossible through the axon tunnel).
Host-side string materialization is microseconds and excluded.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import jax
import jax.numpy as jnp

from dsjax.audio.features import spectrogram_jax
from dsjax.config import BiDirectionalConfig, SpectConfig
from dsjax.decode.greedy import greedy_collapse_device
from dsjax.labels import DEFAULT_LABELS
from dsjax.model.ds2 import DeepSpeech2, init_model

SECONDS = float(os.environ.get("DSJAX_SERVE_SECONDS", "10.0"))
BATCH = int(os.environ.get("DSJAX_SERVE_BATCH", "8"))


def main():
    cfg = SpectConfig()
    model = DeepSpeech2(num_classes=len(DEFAULT_LABELS), spect_cfg=cfg,
                        model_cfg=BiDirectionalConfig(hidden_size=1024,
                                                      hidden_layers=5),
                        dtype=jnp.bfloat16)
    n_frames = int(SECONDS * 100)
    hop = 160

    def make_prog(n):
        @jax.jit
        def run(seed):
            k = jax.random.split(jax.random.PRNGKey(seed), 2)
            variables = init_model(model, k[0], batch=2, frames=64)
            audio = jax.random.normal(k[1], (BATCH, (n_frames + 1) * hop),
                                      jnp.float32) * 0.1
            lens = jnp.full((BATCH,), n_frames, jnp.int32)

            def body(a, _):
                feats = spectrogram_jax(a, lens, cfg, normalize=True)
                probs, out_lens, _ = model.apply(variables, feats, lens,
                                                 train=False)
                ids, keep = greedy_collapse_device(probs, out_lens)
                return a + 1e-9 * jnp.sum(keep), jnp.sum(ids)

            a, s = jax.lax.scan(body, audio, None, length=n)
            return jnp.sum(a[0, :4]) + s[-1]

        return run

    f1, f2 = make_prog(1), make_prog(9)
    float(f1(0)); float(f2(0))

    def t(f):
        best = 1e9
        for i in range(2):
            t0 = time.perf_counter()
            float(f(i + 3))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (t(f2) - t(f1)) / 8
    print(f"transcribe device path: batch={BATCH} x {SECONDS:.0f}s audio -> "
          f"{dt * 1000:.2f} ms/batch ({dt / BATCH * 1000:.2f} ms/utt, "
          f"RTF={dt / BATCH / SECONDS:.5f})")


def main_http():
    """End-to-end HTTP serving latency percentiles: starts the real server
    in-process (flagship model unless DSJAX_SERVE_CKPT points at a
    checkpoint), drives it with DSJAX_SERVE_CLIENTS concurrent clients
    uploading DSJAX_SERVE_SECONDS wavs, reports p50/p90/p99 and utt/s.
    Usage: python tools/serving_bench.py --http
    """
    import http.client
    import json as _json
    import tempfile
    import threading
    from http.server import ThreadingHTTPServer

    import numpy as np

    from dsjax.audio.io import save_wav
    from dsjax.config import ServerConfig
    from dsjax.decode.greedy import GreedyDecoder
    from dsjax.inference import ModelBundle, load_model
    from dsjax.server import BatchWorker, make_handler

    clients = int(os.environ.get("DSJAX_SERVE_CLIENTS", "8"))
    n_requests = int(os.environ.get("DSJAX_SERVE_REQUESTS", "64"))
    ckpt = os.environ.get("DSJAX_SERVE_CKPT", "")

    cfg = ServerConfig()
    cfg.max_batch = max(8, clients)
    if ckpt:
        bundle = load_model(ckpt, precision=16)
    else:
        model = DeepSpeech2(num_classes=len(DEFAULT_LABELS),
                            spect_cfg=SpectConfig(),
                            model_cfg=BiDirectionalConfig(hidden_size=1024,
                                                          hidden_layers=5),
                            dtype=jnp.bfloat16)
        variables = init_model(model, jax.random.PRNGKey(0), batch=2, frames=64)
        bundle = ModelBundle(model, variables, list(DEFAULT_LABELS), SpectConfig())
    cfg.warmup_seconds = SECONDS
    worker = BatchWorker(bundle, GreedyDecoder(bundle.labels), cfg)
    print("warming up compiled shapes...")
    worker.warmup()
    worker.start()
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(worker, cfg))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    sr = bundle.spect_cfg.sample_rate
    rng = np.random.default_rng(0)
    y = (0.1 * np.sin(2 * np.pi * 440 * np.arange(int(sr * SECONDS)) / sr)
         + 0.01 * rng.standard_normal(int(sr * SECONDS))).astype(np.float32)
    with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
        wav_path = f.name
    save_wav(wav_path, y, sr)
    payload = open(wav_path, "rb").read()
    os.unlink(wav_path)
    boundary = "servingbench"
    body = ((f"--{boundary}\r\nContent-Disposition: form-data; name=\"file\"; "
             f"filename=\"u.wav\"\r\nContent-Type: audio/wav\r\n\r\n").encode()
            + payload + f"\r\n--{boundary}--\r\n".encode())
    headers = {"Content-Type": f"multipart/form-data; boundary={boundary}"}

    def post():
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        t0 = time.perf_counter()
        conn.request("POST", "/transcribe", body=body, headers=headers)
        r = conn.getresponse()
        _json.loads(r.read())
        assert r.status == 200
        return time.perf_counter() - t0

    post()  # warm the compile
    lat: list = []
    lock = threading.Lock()
    t_start = time.perf_counter()

    def client(n):
        for _ in range(n):
            d = post()
            with lock:
                lat.append(d)

    per = n_requests // clients
    threads = [threading.Thread(target=client, args=(per,)) for _ in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start
    lat.sort()
    q = lambda p: lat[min(len(lat) - 1, int(p * len(lat)))] * 1000
    print(f"http serving: {len(lat)} x {SECONDS:.0f}s utts, {clients} clients "
          f"-> p50 {q(0.50):.0f} ms  p90 {q(0.90):.0f} ms  p99 {q(0.99):.0f} ms  "
          f"({len(lat) / wall:.1f} utt/s)")
    httpd.shutdown()
    worker.running = False


def main_mixed():
    """Mixed-traffic serving: short batched requests racing long chunked
    uploads plus a variable-chunk /stream session. Reports short-request
    p50/p99 WITH and WITHOUT a long upload in flight (the long request
    runs on the side pool, so it must not stall the batch), and per-chunk
    /stream latencies (bucketed chunk shapes -> no recompile storm).
    Usage: python tools/serving_bench.py --mixed
    """
    import http.client
    import json as _json
    import tempfile
    import threading
    from http.server import ThreadingHTTPServer

    import numpy as np

    from dsjax.audio.io import save_wav
    from dsjax.config import ServerConfig
    from dsjax.decode.greedy import GreedyDecoder
    from dsjax.inference import ModelBundle, load_model
    from dsjax.server import BatchWorker, make_handler

    clients = int(os.environ.get("DSJAX_SERVE_CLIENTS", "4"))
    ckpt = os.environ.get("DSJAX_SERVE_CKPT", "")
    long_seconds = float(os.environ.get("DSJAX_SERVE_LONG_SECONDS", "32"))

    cfg = ServerConfig()
    cfg.max_batch = max(8, clients)
    cfg.chunk_size_seconds = SECONDS  # longer uploads go down the chunked path
    if ckpt:
        bundle = load_model(ckpt, precision=16)
    else:
        model = DeepSpeech2(num_classes=len(DEFAULT_LABELS),
                            spect_cfg=SpectConfig(),
                            model_cfg=BiDirectionalConfig(hidden_size=1024,
                                                          hidden_layers=5),
                            dtype=jnp.bfloat16)
        variables = init_model(model, jax.random.PRNGKey(0), batch=2, frames=64)
        bundle = ModelBundle(model, variables, list(DEFAULT_LABELS), SpectConfig())
    cfg.warmup_seconds = SECONDS
    worker = BatchWorker(bundle, GreedyDecoder(bundle.labels), cfg)
    print("warming up compiled shapes...")
    worker.warmup()
    worker.start()
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(worker, cfg))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    sr = bundle.spect_cfg.sample_rate
    rng = np.random.default_rng(0)

    def wav_bytes(seconds):
        n = int(sr * seconds)
        y = (0.1 * np.sin(2 * np.pi * 330 * np.arange(n) / sr)
             + 0.01 * rng.standard_normal(n)).astype(np.float32)
        with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
            path = f.name
        save_wav(path, y, sr)
        data = open(path, "rb").read()
        os.unlink(path)
        return data

    boundary = "servingbench"

    def multipart(payload):
        return ((f"--{boundary}\r\nContent-Disposition: form-data; "
                 f"name=\"file\"; filename=\"u.wav\"\r\n"
                 f"Content-Type: audio/wav\r\n\r\n").encode()
                + payload + f"\r\n--{boundary}--\r\n".encode())

    headers = {"Content-Type": f"multipart/form-data; boundary={boundary}"}
    short_body = multipart(wav_bytes(SECONDS * 0.98))
    long_body = multipart(wav_bytes(long_seconds))

    def post(path, body):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        t0 = time.perf_counter()
        conn.request("POST", path, body=body, headers=headers)
        r = conn.getresponse()
        _json.loads(r.read())
        assert r.status == 200, r.status
        return time.perf_counter() - t0

    post("/transcribe", short_body)  # warm
    post("/transcribe", long_body)   # warm the chunked path shapes

    def run_shorts(n_per_client):
        lat, lock = [], threading.Lock()

        def client():
            for _ in range(n_per_client):
                d = post("/transcribe", short_body)
                with lock:
                    lat.append(d)

        ts = [threading.Thread(target=client) for _ in range(clients)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        lat.sort()
        q = lambda p: lat[min(len(lat) - 1, int(p * len(lat)))] * 1000
        return q(0.5), q(0.99)

    p50_base, p99_base = run_shorts(4)
    print(f"mixed: shorts alone           p50 {p50_base:.0f} ms  "
          f"p99 {p99_base:.0f} ms")

    long_done = threading.Event()
    long_lat = [0.0]

    def long_client():
        long_lat[0] = post("/transcribe", long_body)
        long_done.set()

    lt = threading.Thread(target=long_client)
    lt.start()
    p50_mix, p99_mix = run_shorts(4)
    lt.join()
    print(f"mixed: shorts + long in-flight p50 {p50_mix:.0f} ms  "
          f"p99 {p99_mix:.0f} ms  (long {long_lat[0]:.1f} s; "
          f"blocked-batch would push p50 toward the long's latency)")

    # variable-chunk /stream: chunk durations vary but share one bucketed
    # shape -> after the first chunk no further compiles
    chunk_secs = [0.9, 1.05, 1.2, 0.95, 1.28, 1.1, 1.0, 1.15] * 2
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
    per_chunk = []
    for i, cs in enumerate(chunk_secs):
        payload = wav_bytes(cs)
        t0 = time.perf_counter()
        final = "1" if i == len(chunk_secs) - 1 else "0"
        conn.request("POST", f"/stream?session=mixed&final={final}",
                     body=payload, headers={"Content-Type": "audio/wav"})
        r = conn.getresponse()
        _json.loads(r.read())
        assert r.status == 200
        per_chunk.append(time.perf_counter() - t0)
    head = per_chunk[0] * 1000
    rest = sorted(per_chunk[1:])
    print(f"mixed: /stream variable chunks first {head:.0f} ms, then "
          f"p50 {rest[len(rest) // 2] * 1000:.0f} ms  "
          f"max {rest[-1] * 1000:.0f} ms over {len(rest)} chunks "
          f"(no per-length recompiles)")
    httpd.shutdown()
    worker.running = False


if __name__ == "__main__":
    if "--http" in sys.argv:
        main_http()
    elif "--mixed" in sys.argv:
        main_mixed()
    else:
        main()
