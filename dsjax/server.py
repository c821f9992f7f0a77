"""HTTP inference server (stdlib, no Flask dependency).

Reference parity (server.py:22-84): POST /transcribe with a multipart audio
file returns the transcription JSON. Improvements over the reference's
single-threaded Flask dev server:
  * dynamic batching: concurrent requests are padded into one batch and run
    through the model together (the reference runs one file at a time);
  * both whole-file and chunked streaming paths work (the reference has a
    latent bug passing no chunk_size_seconds, server.py:40-47);
  * GET /health for orchestration liveness probes.
Accepted uploads: .wav/.flac natively, plus .mp3/.ogg/.opus/.webm through
the in-process native decoder (dsjax/cpp/src/audio_decode.cpp) — the
reference needs sox/torchaudio binaries for those (server.py:22-30).
"""

from __future__ import annotations

import json
import queue
import re
import tempfile
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional, Tuple

import numpy as np

from dsjax.audio.features import FeatureExtractor, spectrogram_np
from dsjax.audio.io import load_audio
from dsjax.config import ServerConfig
from dsjax.inference import decode_results, load_decoder, load_model

ALLOWED_EXTENSIONS = {"wav", "flac"}
COMPRESSED_EXTENSIONS = {"mp3", "ogg", "oga", "opus", "webm"}


class _Request:
    def __init__(self, audio: np.ndarray):
        self.audio = audio
        self.event = threading.Event()
        self.result: Optional[dict] = None
        self.error: Optional[str] = None


class _StreamSession:
    """Server-held state for incremental transcription: RNN carry + the
    greedy-decode carry (collapsed text so far + last argmax label). CTC
    greedy collapse is a per-frame streaming operation, so per-chunk cost
    and session memory are O(chunk) — equal to re-decoding the full
    posterior history, without keeping it (the streaming analog of
    reference inference.py:86-96's per-call chunk loop)."""

    def __init__(self, blank_index: int = 0):
        self.carry = None
        self.text: str = ""
        self.prev_label: int = blank_index
        # streaming-beam state (device beam decoder): full search carry +
        # W hypothesis strings; memory is O(W x transcript), i.e. the
        # hypotheses themselves — no posterior history is kept
        self.beam_state = None
        # running normalization stats over ALL frames seen so far: a tiny
        # chunk normalized by its own 5-frame statistics is garbage; the
        # cumulative stats converge to the utterance stats the one-shot
        # path uses (reference ChunkSpectrogramParser normalizes per chunk
        # and suffers exactly this on small chunks)
        self.feat_sum = 0.0
        self.feat_sumsq = 0.0
        self.feat_count = 0
        self.lock = threading.Lock()
        self.last_used = time.time()


class BatchWorker(threading.Thread):
    """Collects requests for up to batch_timeout_ms and runs them as one
    padded batch through the model."""

    def __init__(self, bundle, decoder, cfg: ServerConfig):
        super().__init__(daemon=True)
        self.bundle = bundle
        self.decoder = decoder
        self.cfg = cfg
        self.extractor = FeatureExtractor(bundle.spect_cfg, normalize=True)
        # responses surface only the top hypothesis (decode_results default
        # top_paths=1): a device beam then backtracks/transfers one char
        # stream per utterance instead of beam_width of them
        self._n_best = 1
        self.queue: "queue.Queue[_Request]" = queue.Queue()
        self.running = True
        self._sessions: dict = {}
        self._sessions_lock = threading.Lock()
        # chunked long-audio requests run on this side pool so a single
        # 10-minute upload never stalls the batched short-request traffic
        # behind it (the device interleaves the two streams; the batch
        # thread keeps collecting while chunks decode)
        from concurrent.futures import ThreadPoolExecutor

        self._long_pool = ThreadPoolExecutor(
            max_workers=2, thread_name_prefix="dsjax-long")

    def submit(self, req: _Request) -> None:
        self.queue.put(req)

    def warmup(self) -> None:
        """Pre-compile the batched forward for every power-of-2 batch size
        at the configured utterance length, so no live request pays an XLA
        compile (measured: an un-warmed batch size costs ~10-20 s on TPU)."""
        secs = getattr(self.cfg, "warmup_seconds", 0.0)
        if secs <= 0:
            return
        sr = self.bundle.spect_cfg.sample_rate
        spect = self.extractor(np.zeros(int(sr * secs), np.float32))
        max_t = ((spect.shape[1] + 63) // 64) * 64
        b = 1
        while b <= self.cfg.max_batch:
            inputs = np.zeros((b, spect.shape[0], max_t), np.float32)
            lengths = np.full((b,), spect.shape[1], np.int32)
            probs, _, _ = self.bundle.forward(inputs, lengths)
            np.asarray(probs)
            b *= 2

    def run(self) -> None:
        while self.running:
            try:
                first = self.queue.get(timeout=0.25)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.time() + self.cfg.batch_timeout_ms / 1000.0
            while len(batch) < self.cfg.max_batch and time.time() < deadline:
                try:
                    batch.append(self.queue.get(timeout=max(0.0, deadline - time.time())))
                except queue.Empty:
                    break
            self._process(batch)

    def _process(self, batch: List[_Request]) -> None:
        try:
            # long audio goes through the chunked streaming path with RNN
            # state carry (reference: inference.py:79-99); short requests
            # are padded into one batch
            if self.cfg.chunk_size_seconds > 0:
                long_reqs = [r for r in batch
                             if len(r.audio) > self.cfg.chunk_size_seconds
                             * self.bundle.spect_cfg.sample_rate]
                for r in long_reqs:
                    self._long_pool.submit(self._process_chunked, r)
                batch = [r for r in batch if r not in long_reqs]
                if not batch:
                    return
            spects = [self.extractor(r.audio) for r in batch]
            max_t = max(s.shape[1] for s in spects)
            max_t = ((max_t + 63) // 64) * 64  # bucket to bound recompiles
            # pad the BATCH dim to a power of two as well — every distinct
            # (batch, T) shape is a fresh XLA compile, and dynamic batching
            # produces arbitrary batch sizes (measured: a recompile storm
            # putting p50 at ~11 s; bucketed: ~0.2 s)
            b_pad = 1
            while b_pad < len(batch):
                b_pad *= 2
            inputs = np.zeros((b_pad, spects[0].shape[0], max_t), np.float32)
            lengths = np.ones((b_pad,), np.int32)
            for i, s in enumerate(spects):
                inputs[i, :, : s.shape[1]] = s
                lengths[i] = s.shape[1]
            probs, out_lens, _ = self.bundle.forward(inputs, lengths)
            probs = np.asarray(probs)[: len(batch)]
            out_lens = np.asarray(out_lens)[: len(batch)]
            decoded, offsets = self.decoder.decode(np.asarray(probs),
                                                    np.asarray(out_lens),
                                                    n_best=self._n_best)
            for i, req in enumerate(batch):
                req.result = decode_results([decoded[i]], [offsets[i]])
                req.event.set()
        except Exception as e:  # propagate per-request
            for req in batch:
                req.error = str(e)
                req.event.set()

    # -- incremental streaming sessions ---------------------------------

    def stream_chunk(self, session_id: str, audio: np.ndarray,
                     final: bool) -> dict:
        """Feed one audio chunk into a session; returns the transcript so
        far. Both the model (RNN carry) and the decoder (greedy-collapse
        carry) are incremental, so arbitrarily long streams use CONSTANT
        session memory and O(chunk) work per call."""
        blank = getattr(self.decoder, "blank_index", 0)
        ttl = getattr(self.cfg, "stream_session_ttl", 300.0)
        with self._sessions_lock:
            sess = self._sessions.setdefault(session_id, _StreamSession(blank))
            # GC idle sessions (ServerConfig.stream_session_ttl)
            now = time.time()
            for sid in [s for s, v in self._sessions.items()
                        if now - v.last_used > ttl and s != session_id]:
                del self._sessions[sid]
        with sess.lock:
            sess.last_used = time.time()
            if len(audio):
                raw = spectrogram_np(audio, self.bundle.spect_cfg,
                                     normalize=False)
                sess.feat_sum += float(raw.astype(np.float64).sum())
                sess.feat_sumsq += float((raw.astype(np.float64) ** 2).sum())
                sess.feat_count += raw.size
                mean = sess.feat_sum / sess.feat_count
                # ddof=1 + eps floor to match spectrogram_np exactly, so a
                # single-chunk session equals the one-shot /transcribe path
                var = max((sess.feat_sumsq - sess.feat_count * mean * mean)
                          / max(sess.feat_count - 1, 1), 0.0)
                std = max(np.sqrt(var), 1e-10)
                spect = ((raw - mean) / std)[None].astype(np.float32)
                t_true = spect.shape[2]
                # bucket the chunk's frame count like the batch path: a
                # client sending variable-length (e.g. VAD-gated) chunks
                # must not trigger one XLA compile per novel length (the
                # RNN carry freezes at the true length, so the padding is
                # inert; outputs past out_len are sliced off below)
                t_pad = ((t_true + 63) // 64) * 64
                if t_pad > t_true:
                    spect = np.pad(spect, ((0, 0), (0, 0),
                                           (0, t_pad - t_true)))
                lens = np.array([t_true], np.int32)
                probs, out_lens, sess.carry = self.bundle.forward(
                    spect, lens, sess.carry)
                probs = np.asarray(probs)[:, : int(np.asarray(out_lens)[0])]
                if hasattr(self.decoder, "decode_chunk"):
                    # streaming BEAM search (optionally LM-fused on device):
                    # the beam state carries across chunks, so the running
                    # transcript equals a one-shot beam decode so far
                    sess.text, sess.beam_state = self.decoder.decode_chunk(
                        probs, sess.beam_state)
                else:
                    # incremental greedy collapse over this chunk only
                    # (host beam decoders cannot stream; /stream degrades
                    # to greedy for them rather than erroring)
                    int_to_char = getattr(self.decoder, "int_to_char", None)
                    if int_to_char is None:
                        int_to_char = self.decoder.label_map.int_to_char
                    for lbl in np.argmax(probs[0], axis=-1):
                        lbl = int(lbl)
                        if lbl != blank and lbl != sess.prev_label:
                            sess.text += int_to_char[lbl]
                        sess.prev_label = lbl
            out = {"transcription": sess.text, "final": final}
            if final:
                with self._sessions_lock:
                    self._sessions.pop(session_id, None)
            return out

    def _process_chunked(self, req: _Request) -> None:
        try:
            carry = None
            outs = []
            for chunk in self.extractor.chunks(req.audio,
                                               self.cfg.chunk_size_seconds):
                if len(chunk) == 0:
                    continue
                spect = self.extractor(chunk)[None]
                t_true = spect.shape[2]
                # bucket the (variable) final chunk's frame count so each
                # distinct file length doesn't compile a fresh shape
                t_pad = ((t_true + 63) // 64) * 64
                if t_pad > t_true:
                    spect = np.pad(spect, ((0, 0), (0, 0),
                                           (0, t_pad - t_true)))
                lens = np.array([t_true], np.int32)
                probs, out_lens, carry = self.bundle.forward(spect, lens,
                                                             carry)
                outs.append(np.asarray(probs)[:, : int(np.asarray(out_lens)[0])])
            all_out = np.concatenate(outs, axis=1)
            decoded, offsets = self.decoder.decode(all_out, n_best=self._n_best)
            req.result = decode_results([decoded[0]], [offsets[0]])
            req.event.set()
        except Exception as e:
            req.error = str(e)
            req.event.set()


def make_handler(worker: BatchWorker, cfg: ServerConfig):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._send(200, {"status": "ok"})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            from urllib.parse import parse_qs, urlparse

            url = urlparse(self.path)
            if url.path == "/stream":
                q = parse_qs(url.query)
                session = (q.get("session") or ["default"])[0]
                final = (q.get("final") or ["0"])[0] in ("1", "true")
                length = int(self.headers.get("Content-Length", 0))
                data = self.rfile.read(length)
                ctype = self.headers.get("Content-Type", "")
                _, payload = _parse_upload(ctype, data)
                audio = np.zeros((0,), np.float32)
                if payload:
                    try:
                        with tempfile.NamedTemporaryFile(suffix=".wav") as f:
                            f.write(payload)
                            f.flush()
                            audio = load_audio(f.name,
                                               worker.bundle.spect_cfg.sample_rate)
                    except Exception as e:
                        self._send(400, {"error": f"could not decode audio: {e}"})
                        return
                try:
                    self._send(200, worker.stream_chunk(session, audio, final))
                except Exception as e:
                    self._send(500, {"error": str(e)})
                return
            if url.path != "/transcribe":
                self._send(404, {"error": "not found"})
                return
            ctype = self.headers.get("Content-Type", "")
            length = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(length)
            filename, payload = _parse_upload(ctype, data)
            if payload is None:
                self._send(400, {"error": "expected multipart file upload or audio/wav body"})
                return
            ext = (filename or "upload.wav").rsplit(".", 1)[-1].lower()
            if ext in COMPRESSED_EXTENSIONS:
                # per-codec capability check (a host with only libmpg123
                # must 415 an .opus upload, not 400 it mid-decode)
                from dsjax.cpp.audio_binding import can_decode

                if not can_decode(f"x.{ext}"):
                    self._send(415, {"error": f".{ext}: codec library not "
                                              f"available on this host"})
                    return
            elif ext not in ALLOWED_EXTENSIONS:
                self._send(415, {"error": f"unsupported extension .{ext}"})
                return
            try:
                sr = worker.bundle.spect_cfg.sample_rate
                if ext in COMPRESSED_EXTENSIONS:
                    from dsjax.audio.io import resample
                    from dsjax.cpp.audio_binding import decode_bytes

                    audio, in_sr = decode_bytes(payload)
                    if in_sr != sr:
                        audio = np.ascontiguousarray(
                            resample(audio, in_sr, sr), np.float32)
                else:
                    with tempfile.NamedTemporaryFile(suffix=f".{ext}") as f:
                        f.write(payload)
                        f.flush()
                        audio = load_audio(f.name, sr)
            except Exception as e:
                self._send(400, {"error": f"could not decode audio: {e}"})
                return
            req = _Request(audio)
            worker.submit(req)
            req.event.wait()
            if req.error:
                self._send(500, {"error": req.error})
            else:
                self._send(200, req.result)

    return Handler


def _parse_upload(content_type: str, data: bytes) -> Tuple[Optional[str], Optional[bytes]]:
    """Minimal multipart/form-data parser; also accepts raw audio bodies."""
    m = re.search(r'boundary="?([^";]+)"?', content_type)
    if not m:
        if content_type.startswith("audio/") or content_type == "application/octet-stream":
            return "upload.wav", data
        return None, None
    boundary = ("--" + m.group(1)).encode()
    for part in data.split(boundary):
        if b"Content-Disposition" not in part:
            continue
        header, _, body = part.partition(b"\r\n\r\n")
        if b"filename=" not in header:
            continue
        fm = re.search(rb'filename="([^"]*)"', header)
        filename = fm.group(1).decode(errors="replace") if fm else "upload.wav"
        # each split part ends with exactly one CRLF that precedes the next
        # boundary marker; strip ONLY that (rstrip over a charset would eat
        # legitimate trailing 0x0D/0x0A audio bytes)
        if body.endswith(b"\r\n"):
            body = body[:-2]
        return filename, body
    return None, None


def main(cfg: ServerConfig) -> None:
    print("Setting up server...")
    from dsjax.workflows import apply_platform

    apply_platform(cfg.platform, cfg.num_cpu_devices)
    bundle = load_model(cfg.model.model_path, cfg.model.precision)
    decoder = load_decoder(bundle.labels, cfg.lm)
    worker = BatchWorker(bundle, decoder, cfg)
    print("Warming up compiled shapes...")
    worker.warmup()
    worker.start()
    server = ThreadingHTTPServer((cfg.host, cfg.port), make_handler(worker, cfg))
    print(f"Server initialised on {cfg.host}:{cfg.port}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        worker.running = False
        server.shutdown()
