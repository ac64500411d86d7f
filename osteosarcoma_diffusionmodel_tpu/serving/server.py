"""Minimal production serving API for synthetic patient generation.

The reference only *documents* a deployment API (reference
docs/DEPLOYMENT.md:478-508 sketches endpoints and a <1 s/generation
latency SLA; nothing is implemented). This module implements it on the
stdlib HTTP server (no web-framework dependency):

    POST /generate   {"num_samples": N, "scenario": {...},
                      "sampler": "ddpm"|"ddim"}      -> patient arrays
    GET  /health     -> {"status": "ok", ...}
    GET  /metrics    -> request counts + latency stats

The sampler is jit-compiled at startup per (batch bucket, sampler) so
steady-state requests never pay compile time; batch bucketing rounds
requests up to a power of two to bound the number of compiled programs.
With the scan-compiled DDPM at ~5k patients/sec on one TPU v5e chip,
the documented 1 s SLA holds even for full 1000-step cohorts.
"""

from __future__ import annotations

import json
import logging
import os
import threading
import time
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np

from ..config import Config
from ..generation.generator import SyntheticPatientGenerator, load_trained_model

logger = logging.getLogger(__name__)

MAX_BATCH = 16384
# A JSON body of 16384 x 5142 floats is multi-GB; above this cohort
# size the client must request {"format": "npz"} (compressed binary)
# or page the request.
MAX_JSON_SAMPLES = 1024
MAX_REQUEST_BYTES = 1_000_000


def _bucket(n: int) -> int:
    """Round up to the next power of two to bound compile count."""
    b = 1
    while b < n:
        b *= 2
    return min(b, MAX_BATCH)


class GenerationService:
    """Thread-safe wrapper around a loaded model + generator."""

    def __init__(
        self,
        checkpoint_dir: str | Path,
        config: Optional[Config] = None,
        request_log_path: Optional[str] = None,
        profile_cache_size: int = 0,
    ):
        """`profile_cache_size`: >0 enables the common-profile response
        cache the reference sketches (its DEPLOYMENT.md lru_cache over
        rounded conditions): identical (rounded scenario, bucket,
        sampler) requests return the SAME cohort — opt-in, because
        reusing a cohort is a deliberate semantic change from fresh
        sampling per request."""
        model, params, batch_stats, config, dims = load_trained_model(
            checkpoint_dir, config
        )
        from ..training.checkpoint import load_data_stats

        self.config = config
        self.dims = dims
        data_stats = load_data_stats(checkpoint_dir)
        self.generator = SyntheticPatientGenerator(
            model, params, config, dims, batch_stats,
            data_stats=data_stats,
        )
        from .monitoring import DriftMonitor, SecureRequestLog

        self.drift: Optional[DriftMonitor] = None
        if data_stats is not None and "condition_mean" in data_stats:
            self.drift = DriftMonitor(
                data_stats["condition_mean"],
                data_stats["condition_std"],
                dims.condition_names,
            )
        self.request_log: Optional[SecureRequestLog] = (
            SecureRequestLog(request_log_path) if request_log_path else None
        )
        self._lock = threading.Lock()
        self._seed = 0
        self._profile_cache_size = profile_cache_size
        self._profile_cache: Dict = {}  # insertion-ordered (LRU evict)
        self.metrics: Dict[str, float] = {
            "requests": 0, "patients": 0, "total_seconds": 0.0,
            "max_seconds": 0.0, "cache_hits": 0, "warmups": 0,
            "warmup_seconds": 0.0,
        }
        # Rolling window of served (non-internal, non-cache-hit)
        # request latencies for the p50/p95/p99 the <1 s SLA is judged
        # on (reference docs/DEPLOYMENT.md latency target; mean/max
        # alone hide tail behavior).
        self._latencies: deque = deque(maxlen=1024)

    @staticmethod
    def _profile_key(scenario: Optional[Dict], bucket: int, sampler: str):
        """Cache key with rounded conditions (the reference's
        round-to-reduce-misses recipe): survival to the nearest 100
        days, other numerics to 2 decimals."""
        rounded = []
        for k in sorted(scenario or {}):
            v = (scenario or {})[k]
            if not isinstance(v, (int, float, bool)):
                return None  # unhashable/freeform scenario: skip cache
            if k == "survival_time":
                v = round(float(v) / 100.0) * 100.0
            else:
                v = round(float(v), 2)
            rounded.append((k, v))
        return (tuple(rounded), bucket, sampler)

    def warmup(self, batches=(64,), samplers=("ddpm",)) -> None:
        """Pre-compile the sampler for the given batch buckets.

        Each distinct (bucket, sampler) pair is a distinct XLA program;
        compiling them at startup (instead of on the first request that
        hits the pair) removes the 20-40 s first-request latency cliff.
        Buckets are compiled largest-first so the biggest allocation
        happens while the heap is emptiest.
        """
        if isinstance(batches, int):
            batches = (batches,)
        if isinstance(samplers, str):
            samplers = (samplers,)
        for s in samplers:
            for b in sorted(
                set(_bucket(int(b)) for b in batches), reverse=True
            ):
                self.generate(
                    b, scenario={"survival_time": 800}, sampler=s,
                    internal=True,
                )

    def generate(
        self, num_samples: int, scenario: Optional[Dict] = None,
        sampler: Optional[str] = None, internal: bool = False,
    ) -> Dict[str, np.ndarray]:
        """`internal` marks warmup/self-test traffic: it compiles but
        must not pollute the latency metrics (the 20-40 s first-compile
        would dominate max_seconds and misread against the <1 s SLA),
        the drift monitor, or the request audit log; its wall time is
        tracked separately as warmup_seconds."""
        if not 1 <= num_samples <= MAX_BATCH:
            raise ValueError(f"num_samples must be in [1, {MAX_BATCH}]")
        bucket = _bucket(num_samples)
        cache_key = None
        if self._profile_cache_size > 0 and not internal:
            cache_key = self._profile_key(
                scenario, bucket, sampler or self.config.generation.sampler
            )
            if cache_key is not None:
                with self._lock:
                    cached = self._profile_cache.get(cache_key)
                    if cached is not None:
                        # Refresh LRU position.
                        self._profile_cache.pop(cache_key)
                        self._profile_cache[cache_key] = cached
                        self.metrics["requests"] += 1
                        self.metrics["patients"] += num_samples
                        self.metrics["cache_hits"] += 1
                # Cache hits must stay visible to drift detection and
                # the audit trail — a cached cohort is still a served
                # request (marked cached=True in the log).
                if cached is not None:
                    if self.drift is not None:
                        self.drift.update(
                            cached["conditions"][:num_samples]
                        )
                    if self.request_log is not None:
                        self.request_log.log_generation(
                            scenario, num_samples,
                            sampler or self.config.generation.sampler,
                            0.0, cached=True,
                        )
                    return {k: v[:num_samples] for k, v in cached.items()}
        t0 = time.perf_counter()
        # The whole generate runs under the lock: device work is
        # serialized anyway, and the per-request sampler override must
        # not race a concurrent request's read of the shared config.
        with self._lock:
            self._seed += 1
            # Per-request override must not leak into later requests
            # that rely on the configured default.
            default_sampler = self.config.generation.sampler
            if sampler:
                self.config.generation.sampler = sampler
            try:
                out = self.generator.generate(
                    bucket, scenario, rng=jax.random.PRNGKey(self._seed)
                )
            finally:
                self.config.generation.sampler = default_sampler
            dt = time.perf_counter() - t0
            if internal:
                self.metrics["warmups"] += 1
                self.metrics["warmup_seconds"] += dt
            else:
                self.metrics["requests"] += 1
                self.metrics["patients"] += num_samples
                self.metrics["total_seconds"] += dt
                self.metrics["max_seconds"] = max(
                    self.metrics["max_seconds"], dt
                )
                self._latencies.append(dt)
        if not internal:
            if self.drift is not None:
                self.drift.update(out["conditions"][:num_samples])
            if self.request_log is not None:
                self.request_log.log_generation(
                    scenario, num_samples,
                    sampler or self.config.generation.sampler, dt,
                )
        if cache_key is not None:
            with self._lock:
                self._profile_cache[cache_key] = out
                while len(self._profile_cache) > self._profile_cache_size:
                    self._profile_cache.pop(
                        next(iter(self._profile_cache))
                    )
        return {k: v[:num_samples] for k, v in out.items()}

    def metrics_summary(self) -> Dict[str, float]:
        """Metrics dict with derived fields (mean latency, drift)."""
        m = dict(self.metrics)
        if m["requests"]:
            m["mean_seconds"] = m["total_seconds"] / m["requests"]
        if self._latencies:
            lat = np.sort(np.asarray(self._latencies))
            for q, name in ((50, "p50"), (95, "p95"), (99, "p99")):
                m[f"{name}_seconds"] = float(np.percentile(lat, q))
        if self.drift is not None:
            m["drift_score"] = self.drift.score()
        return m


def make_handler(service: GenerationService, auth_token: Optional[str] = None):
    """Build the request handler.

    With `auth_token` set, every endpoint except GET /health (kept open
    for load-balancer checks) requires `Authorization: Bearer <token>`.
    Compared in constant time; a missing/wrong token is 401.
    """

    class Handler(BaseHTTPRequestHandler):
        # Bound per-connection reads so a stalled client can't pin a
        # handler thread forever.
        timeout = 120

        def log_message(self, fmt, *args):
            logger.debug(fmt, *args)

        @property
        def route(self) -> str:
            """Request path without the query string (load balancers
            commonly probe /health?...)."""
            return self.path.split("?", 1)[0]

        def _authorized(self) -> bool:
            if auth_token is None or self.route == "/health":
                return True
            import hmac

            header = self.headers.get("Authorization", "")
            expected = f"Bearer {auth_token}"
            # Compare as bytes: compare_digest raises on non-ASCII str,
            # and a malformed client header must yield 401, not a 500.
            return hmac.compare_digest(
                header.encode("utf-8", "surrogateescape"),
                expected.encode("utf-8", "surrogateescape"),
            )

        def _send(self, code: int, payload: Dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if not self._authorized():
                self._send(401, {"error": "missing or invalid bearer token"})
                return
            if self.route == "/health":
                self._send(200, {
                    "status": "ok",
                    "architecture": service.config.model.architecture,
                    "data_dim": service.dims.data_dim,
                    "devices": [str(d) for d in jax.devices()],
                })
            elif self.route == "/metrics":
                self._send(200, service.metrics_summary())
            elif self.route == "/dashboard":
                from .monitoring import render_dashboard

                body = render_dashboard(
                    service.metrics_summary(), service.drift,
                    {
                        "architecture": service.config.model.architecture,
                        "data_dim": service.dims.data_dim,
                        "conditions": ", ".join(service.dims.condition_names),
                    },
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._send(404, {"error": "not found"})

        def _send_npz(self, out: Dict):
            import io

            buf = io.BytesIO()
            np.savez_compressed(buf, **out)
            body = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("Content-Disposition",
                             "attachment; filename=synthetic_patients.npz")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if not self._authorized():
                self._send(401, {"error": "missing or invalid bearer token"})
                return
            if self.route != "/generate":
                self._send(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                if length > MAX_REQUEST_BYTES:
                    self._send(413, {
                        "error": f"request body exceeds {MAX_REQUEST_BYTES} bytes"
                    })
                    return
                req = json.loads(self.rfile.read(length) or b"{}")
                num_samples = int(req.get("num_samples", 1))
                fmt = str(req.get("format", "json")).lower()
                if fmt not in ("json", "npz"):
                    self._send(400, {"error": f"unknown format {fmt!r}"})
                    return
                if fmt == "json" and num_samples > MAX_JSON_SAMPLES:
                    self._send(413, {
                        "error": (
                            f"JSON responses are capped at {MAX_JSON_SAMPLES} "
                            f"samples; request {{'format': 'npz'}} for large "
                            f"cohorts or page the request"
                        )
                    })
                    return
                out = service.generate(
                    num_samples,
                    req.get("scenario"),
                    req.get("sampler"),
                )
                if fmt == "npz":
                    self._send_npz(out)
                    return
                self._send(200, {
                    "num_samples": len(out["mutations"]),
                    "mutations": out["mutations"].tolist(),
                    "expression": out["expression"].tolist(),
                    "pathways": out["pathways"].tolist(),
                    "conditions": out["conditions"].tolist(),
                })
            except (ValueError, KeyError, json.JSONDecodeError) as e:
                self._send(400, {"error": str(e)})

    return Handler


def serve(
    checkpoint_dir: str | Path,
    host: str = "127.0.0.1",
    port: int = 8080,
    config: Optional[Config] = None,
    warmup: bool | tuple | list = True,
    auth_token: Optional[str] = None,
    tls_cert: Optional[str] = None,
    tls_key: Optional[str] = None,
    warmup_samplers: tuple | list = ("ddpm",),
    request_log_path: Optional[str] = None,
    profile_cache_size: int = 0,
) -> ThreadingHTTPServer:
    """Start the service (returns the server; call serve_forever()).

    `warmup` may be a list of batch buckets to pre-compile (True means
    the default 64-bucket). Compilation happens before the socket opens
    so a load balancer's health check never routes traffic to a server
    that would stall compiling. `auth_token` enables bearer-token auth
    (all endpoints but /health); `tls_cert`+`tls_key` (PEM paths) wrap
    the socket in TLS — both optional, since production deployments
    typically terminate auth/TLS at the ingress (docs/DEPLOYMENT.md).
    """
    service = GenerationService(
        checkpoint_dir, config, request_log_path=request_log_path,
        profile_cache_size=profile_cache_size,
    )
    if warmup:
        service.warmup(
            (64,) if warmup is True else warmup, samplers=warmup_samplers
        )
    server = ThreadingHTTPServer((host, port), make_handler(service, auth_token))
    if tls_cert or tls_key:
        if not (tls_cert and tls_key):
            raise ValueError("TLS requires both tls_cert and tls_key")
        import ssl

        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        ctx.load_cert_chain(certfile=tls_cert, keyfile=tls_key)
        # Defer the handshake to the per-connection handler thread
        # (first read/write): with the default handshake-on-accept, one
        # stalled client would block the single accept loop — and every
        # other connection — until it disconnects.
        server.socket = ctx.wrap_socket(
            server.socket, server_side=True, do_handshake_on_connect=False
        )
    server.service = service  # for tests/introspection
    logger.info(
        "Serving on %s://%s:%d%s",
        "https" if tls_cert else "http", host, port,
        " (bearer auth)" if auth_token else "",
    )
    return server


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(description="Synthetic patient API server")
    parser.add_argument("--checkpoint-dir", default="./results/checkpoints")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument(
        "--warmup-buckets",
        default="64",
        help="comma-separated batch buckets to pre-compile at startup "
        "(e.g. '64,1024,16384'); empty string skips warmup",
    )
    parser.add_argument(
        "--auth-token",
        default=os.environ.get("OSDM_AUTH_TOKEN"),
        help="require 'Authorization: Bearer <token>' on all endpoints "
        "but /health (default: $OSDM_AUTH_TOKEN; unset = open)",
    )
    parser.add_argument("--tls-cert", help="PEM certificate path (enables TLS)")
    parser.add_argument("--tls-key", help="PEM private-key path")
    parser.add_argument(
        "--warmup-samplers",
        default="ddpm",
        help="comma-separated samplers to pre-compile per bucket "
        "(e.g. 'ddpm,ddim')",
    )
    parser.add_argument(
        "--request-log",
        help="path for the PHI-safe rotating request log (allowlisted "
        "scenario fields only; off when unset)",
    )
    parser.add_argument(
        "--profile-cache",
        type=int,
        default=0,
        help="cache cohorts for up to N common (rounded-scenario, "
        "bucket, sampler) profiles — identical requests return the "
        "SAME cohort (0 = off, fresh sampling per request)",
    )
    args = parser.parse_args(argv)
    buckets = [int(b) for b in args.warmup_buckets.split(",") if b.strip()]
    samplers = [s for s in args.warmup_samplers.split(",") if s.strip()]
    server = serve(
        args.checkpoint_dir, args.host, args.port,
        warmup=buckets or False,
        auth_token=args.auth_token,
        tls_cert=args.tls_cert,
        tls_key=args.tls_key,
        warmup_samplers=samplers or ("ddpm",),
        request_log_path=args.request_log,
        profile_cache_size=args.profile_cache,
    )
    server.serve_forever()


if __name__ == "__main__":
    main()
