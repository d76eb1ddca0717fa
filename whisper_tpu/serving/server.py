"""HTTP serving front-end over the continuous-batching engine.

Covers both reference wire protocols on POST /asr:
- multipart/form-data with a ``wav`` file field (+ optional language/task
  fields) — the Python reference server (python/whisper_svr.py:41-96);
- application/octet-stream raw little-endian f32 16 kHz PCM, length % 4
  validated — the C++ reference server (cpp/src/WhisperHTTPServer.hpp:44-113).

Adds GET /health (reference parity, python/whisper_svr.py:35-38) and
GET /metrics (engine stats; the reference has no metrics endpoint).
Responses are JSON with CORS headers like the C++ server.

Per-request decoding quality is selectable with ``beam`` (query string or
multipart field; ``X-Beam`` header on the octet-stream protocol): beam=1
(default) uses the continuous-batching greedy slots, beam=K>1 routes to the
engine's micro-batched beam worker. The reference is greedy-only.

``format=srt|vtt|tsv|txt`` (query/field/``X-Format``) renders the transcript
through the CLI's subtitle writers (formats.py) instead of the JSON payload;
subtitle formats imply word_timestamps (segments come from word timings).
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from ..ops.audio import WavFormatError, load_audio, pcm_f32_from_bytes
from .engine import ContinuousBatchingEngine, OverloadedError, Request
from .wire import parse_multipart  # noqa: F401  (re-exported; tests import it here)


class WhisperHandler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    engine: ContinuousBatchingEngine = None  # set by make_server
    request_timeout_s: float = 300.0

    def log_message(self, fmt, *args):  # quiet by default
        pass

    def _send(self, code: int, payload: dict):
        body = json.dumps(payload, ensure_ascii=False).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        # CORS, like the C++ server (cpp/src/WhisperHTTPServer.hpp:36-38)
        self.send_header("Access-Control-Allow-Origin", "*")
        self.send_header("Access-Control-Allow-Methods", "POST, GET, OPTIONS")
        self.end_headers()
        self.wfile.write(body)

    def _send_text(self, code: int, text: str, content_type: str):
        body = text.encode("utf-8")
        self.send_response(code)
        self.send_header("Content-Type", content_type)
        self.send_header("Content-Length", str(len(body)))
        self.send_header("Access-Control-Allow-Origin", "*")
        self.send_header("Access-Control-Allow-Methods", "POST, GET, OPTIONS")
        self.end_headers()
        self.wfile.write(body)

    def _stream_request(self, audio, language: str, task: str, beam: int = 1,
                        temperature: float = 0.0,
                        word_timestamps: bool = False,
                        initial_prompt=None, condition_on_previous=False):
        """Chunked response: one JSON line per partial, then the final result.

        Streaming partials per decode round is new capability — the reference
        returns only whole-utterance results.
        """
        import queue as _q

        partials: "_q.Queue[str]" = _q.Queue()
        req = Request(audio=audio, language=language, task=task,
                      beam_size=beam, temperature=temperature,
                      word_timestamps=word_timestamps,
                      initial_prompt=initial_prompt,
                      condition_on_previous=condition_on_previous,
                      on_partial=partials.put)
        fut = self.engine.submit(req)

        self.send_response(200)
        self.send_header("Content-Type", "application/x-ndjson; charset=utf-8")
        self.send_header("Transfer-Encoding", "chunked")
        self.send_header("Access-Control-Allow-Origin", "*")
        self.end_headers()

        def chunk(obj):
            data = (json.dumps(obj, ensure_ascii=False) + "\n").encode()
            self.wfile.write(f"{len(data):x}\r\n".encode() + data + b"\r\n")
            self.wfile.flush()

        deadline = self.request_timeout_s
        import time as _t

        t0 = _t.monotonic()
        last = None
        try:
            while True:
                if fut.done():
                    break
                try:
                    p = partials.get(timeout=0.05)
                    if p != last:
                        chunk({"partial": p})
                        last = p
                except _q.Empty:
                    pass
                if _t.monotonic() - t0 > deadline:
                    chunk({"success": False, "error": "inference timeout"})
                    self.wfile.write(b"0\r\n\r\n")
                    return
            chunk(fut.result(timeout=1.0))
            self.wfile.write(b"0\r\n\r\n")
        except (BrokenPipeError, ConnectionResetError):
            req.on_partial = None  # client went away

    def do_GET(self):
        if self.path == "/health":
            self._send(200, {"status": "healthy"})
        elif self.path == "/metrics":
            self._send(200, self.engine.stats.snapshot())
        else:
            self._send(404, {"success": False, "error": "not found"})

    def do_OPTIONS(self):
        self._send(200, {})

    def do_POST(self):
        route, _, query = self.path.partition("?")
        if route not in ("/asr", "/transcribe"):
            self._send(404, {"success": False, "error": "not found"})
            return
        try:
            from urllib.parse import parse_qs

            qs = {k: v[-1] for k, v in parse_qs(query).items()}
            length = int(self.headers.get("Content-Length", "0"))
            if length <= 0:
                self._send(400, {"success": False, "error": "empty body"})
                return
            body = self.rfile.read(length)
            ctype = self.headers.get("Content-Type", "")
            language = qs.get("language", "zh")
            task = qs.get("task", "transcribe")
            beam = qs.get("beam", "1")
            temperature = qs.get("temperature", "0")
            word_ts = qs.get("word_timestamps", "0")
            # OpenAI --initial_prompt at the serving tier (query param is
            # URL-decoded utf-8; multipart field below; X-Initial-Prompt
            # header on the octet-stream protocol rides latin-1 per HTTP)
            initial_prompt = qs.get("initial_prompt") or None
            cond_prev = qs.get("condition_on_previous", "0")
            # transcript rendering: the CLI's writers, served (srt/vtt/
            # tsv/txt; json = the raw payload, default)
            fmt = qs.get("format", "json")

            if ctype.startswith("multipart/form-data"):
                fields = parse_multipart(body, ctype)
                if "wav" not in fields:
                    self._send(400, {"success": False, "error": "missing wav field"})
                    return
                audio = load_audio(fields["wav"])
                language = fields.get("language", language) or language
                task = fields.get("task", task) or task
                beam = fields.get("beam", beam) or beam
                temperature = (fields.get("temperature", temperature)
                               or temperature)
                word_ts = fields.get("word_timestamps", word_ts) or word_ts
                initial_prompt = (fields.get("initial_prompt")
                                  or initial_prompt)
                cond_prev = (fields.get("condition_on_previous", cond_prev)
                             or cond_prev)
                fmt = fields.get("format", fmt) or fmt
            elif ctype.startswith("application/octet-stream"):
                if len(body) % 4 != 0:
                    # C++ server semantics (WhisperHTTPServer.hpp:60-71)
                    self._send(400, {"success": False,
                                     "error": "binary data size must be multiple of 4"})
                    return
                audio = pcm_f32_from_bytes(body)
                language = self.headers.get("X-Language", language)
                task = self.headers.get("X-Task", task)
                beam = self.headers.get("X-Beam", beam)
                temperature = self.headers.get("X-Temperature", temperature)
                word_ts = self.headers.get("X-Word-Timestamps", word_ts)
                hp = self.headers.get("X-Initial-Prompt")
                if hp:
                    # header values arrive latin-1; recover utf-8 prompts
                    try:
                        initial_prompt = hp.encode("latin-1").decode("utf-8")
                    except (UnicodeDecodeError, UnicodeEncodeError):
                        initial_prompt = hp
                cond_prev = self.headers.get("X-Condition-On-Previous",
                                             cond_prev)
                fmt = self.headers.get("X-Format", fmt)
            else:
                # bare WAV body as a convenience
                audio = load_audio(body)

            if audio.size == 0:
                self._send(400, {"success": False, "error": "empty audio"})
                return
            if task not in ("transcribe", "translate"):
                self._send(400, {"success": False, "error": f"bad task {task!r}"})
                return
            try:
                beam = int(beam)
            except (TypeError, ValueError):
                self._send(400, {"success": False, "error": f"bad beam {beam!r}"})
                return
            if beam < 1 or beam > self.engine.max_beam_size:
                self._send(400, {"success": False,
                                 "error": f"beam must be in 1..{self.engine.max_beam_size}"})
                return
            try:
                temperature = float(temperature)
            except (TypeError, ValueError):
                self._send(400, {"success": False,
                                 "error": f"bad temperature {temperature!r}"})
                return
            if not (0.0 <= temperature <= 2.0):
                self._send(400, {"success": False,
                                 "error": "temperature must be in [0, 2]"})
                return
            word_ts = str(word_ts).lower() in ("1", "true", "yes", "on")
            cond_prev = str(cond_prev).lower() in ("1", "true", "yes", "on")

            from ..formats import HTTP_CONTENT_TYPES, render_payload

            fmt = (fmt or "json").lower()
            if fmt not in HTTP_CONTENT_TYPES:
                self._send(400, {"success": False,
                                 "error": f"bad format {fmt!r}; known: "
                                          f"{sorted(HTTP_CONTENT_TYPES)}"})
                return
            if fmt in ("srt", "vtt", "tsv"):
                word_ts = True  # subtitle segments come from word timings

            stream = self.headers.get("X-Stream") == "1" or qs.get("stream") == "1"
            if stream:
                if fmt != "json":
                    self._send(400, {"success": False,
                                     "error": "format is not supported with "
                                              "streaming (NDJSON only)"})
                    return
                self._stream_request(audio, language, task, beam, temperature,
                                     word_timestamps=word_ts,
                                     initial_prompt=initial_prompt,
                                     condition_on_previous=cond_prev)
                return
            fut = self.engine.submit(Request(audio=audio, language=language,
                                             task=task, beam_size=beam,
                                             temperature=temperature,
                                             word_timestamps=word_ts,
                                             initial_prompt=initial_prompt,
                                             condition_on_previous=cond_prev))
            result = fut.result(timeout=self.request_timeout_s)
            if fmt != "json":
                self._send_text(200, render_payload(result, fmt),
                                HTTP_CONTENT_TYPES[fmt])
            else:
                self._send(200, result)
        except OverloadedError as e:
            self._send(503, {"success": False, "error": str(e)})
        except WavFormatError as e:
            self._send(400, {"success": False, "error": str(e)})
        except ValueError as e:
            self._send(400, {"success": False, "error": str(e)})
        except TimeoutError:
            self._send(504, {"success": False, "error": "inference timeout"})
        except Exception as e:  # noqa: BLE001 — server must not die
            self._send(500, {"success": False, "error": f"{type(e).__name__}: {e}"})


def make_server(engine: ContinuousBatchingEngine, host: str = "0.0.0.0",
                port: int = 8000, request_timeout_s: float = 300.0) -> ThreadingHTTPServer:
    handler = type("BoundHandler", (WhisperHandler,),
                   {"engine": engine, "request_timeout_s": request_timeout_s})
    return ThreadingHTTPServer((host, port), handler)
