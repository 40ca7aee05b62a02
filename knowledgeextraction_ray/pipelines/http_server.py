"""Live HTTP serving — the reference's Tornado surface, transport-swapped.

The reference serves online queries through one Tornado route
(``nerservice/tornado_http_sevrer.py:16-51``): POST ``/methodCore`` with a
JSON body, the handler ``json.loads`` the body, awaits
``processCore(query_argument)``, and writes the JSON result with
``Content-type: application/json``.  Three subclasses bind the models
(``nerservice/ner_server.py:6-56``, ``nerservice/nre_server.py:9-27``):

- ``CRFServer.processCore``: ``data["query_list"]`` is a list of
  ``{"guid", "text"}`` dicts (``utils/crf_processor.py:105-116``); response
  ``{"predictions": [{"words", "tags"}, ...], "query_list": [...]}``.
- ``MRCServer.processCore``: items ``{"id"/"qas_id", "question",
  "context"}``; response is a BARE LIST of ``{"guid", "entities",
  "probabilities", "na_prob"}`` (no envelope — ``ner_server.py:34-56``).
- ``NREAlbertServer.processCore``: OpenNRE-style items; response
  ``{"predictions": [{"relation", "score"}, ...], "query_list": [...]}``.

Tornado is not in this container, so the transport is stdlib
``ThreadingHTTPServer`` — same route, same body/response contracts, same
config file shape as ``config/tornado_server.json`` (``listen_ip`` /
``port`` / ``ServiceName`` / ``debug``).  The compute path is NOT a
re-implementation: each ``process_core`` calls the corresponding batch
serving function (:mod:`.serving`), which runs the same Ray Data stages as
the offline pipelines.  Ray must be initialised by the process that starts
the server (a real deployment fronts a long-lived Ray cluster; batch
remains the 100-TB path, this endpoint is the reference-compatible online
surface).

Requests are serialized with a lock: the reference handles requests on one
Tornado ioloop, so concurrent POSTs never interleave model work there
either — and one Ray Data execution at a time keeps the cluster's
scheduling deterministic for the small online batches this serves.
"""

from __future__ import annotations

import json
import threading
import time
import urllib.request
from dataclasses import dataclass
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


@dataclass
class ServerConfig:
    """Mirror of ``config/tornado_server.json`` (key names preserved)."""
    listen_ip: str = "127.0.0.1"
    port: int = 0                       # 0 = ephemeral (tests)
    service_name: str = "kgray_server"
    debug: bool = False

    @classmethod
    def from_json(cls, path: str) -> "ServerConfig":
        with open(path, "r", encoding="utf-8") as f:
            raw = json.load(f)
        return cls(listen_ip=raw.get("listen_ip", "127.0.0.1"),
                   port=int(raw.get("port", 0)),
                   service_name=raw.get("ServiceName", "kgray_server"),
                   debug=bool(raw.get("debug", False)))


class KGEHTTPServer:
    """Base server: one POST route ``/methodCore``, JSON in / JSON out.

    ``tornado_http_sevrer.py:16-51`` semantics: unknown routes 404, handler
    exceptions surface as 500 (Tornado's default error response).
    ``start()`` blocks like ``IOLoop.current().start()``;
    ``start_background()`` binds, spawns the serve thread and returns
    ``self`` with ``.port`` / ``.url`` resolved — the test/embedding form.
    """

    def __init__(self, config: ServerConfig | str | None = None):
        self.config = (ServerConfig.from_json(config)
                       if isinstance(config, str)
                       else (config or ServerConfig()))
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None
        self._lock = threading.Lock()

    # -- the model hook (subclasses) -------------------------------------
    def process_core(self, data):
        raise NotImplementedError            # KGEHTTPPServer.processCore

    # -- lifecycle --------------------------------------------------------
    def _make_httpd(self) -> ThreadingHTTPServer:
        outer = self

        class _Handler(BaseHTTPRequestHandler):
            def do_POST(self):              # noqa: N802 (stdlib name)
                if self.path != "/methodCore":
                    self.send_error(404)
                    return
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    payload = json.loads(self.rfile.read(n))
                    with outer._lock:
                        result = outer.process_core(payload)
                    body = json.dumps(result).encode("utf-8")
                except Exception as e:       # Tornado: uncaught -> 500
                    self.send_error(500, explain=str(e)
                                    if outer.config.debug else None)
                    return
                self.send_response(200)
                self.send_header("Content-type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, fmt, *args):
                if outer.config.debug:
                    BaseHTTPRequestHandler.log_message(self, fmt, *args)

        return ThreadingHTTPServer(
            (self.config.listen_ip, self.config.port), _Handler)

    @property
    def port(self) -> int:
        assert self._httpd is not None, "server not started"
        return self._httpd.server_address[1]

    @property
    def url(self) -> str:
        host = self.config.listen_ip or "127.0.0.1"
        return f"http://{host}:{self.port}/methodCore"

    def start_background(self) -> "KGEHTTPServer":
        assert self._httpd is None, "already started"
        self._httpd = self._make_httpd()
        self._thread = threading.Thread(
            target=self._httpd.serve_forever,
            name=self.config.service_name, daemon=True)
        self._thread.start()
        return self

    def start(self) -> None:
        """Blocking form (``server.listen`` + ``IOLoop.start``)."""
        self.start_background()
        try:
            self._thread.join()
        except KeyboardInterrupt:
            self.stop()

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
            self._thread = None

    def __enter__(self) -> "KGEHTTPServer":
        return self.start_background()

    def __exit__(self, *exc) -> None:
        self.stop()


class CRFHTTPServer(KGEHTTPServer):
    """``CRFServer`` (``ner_server.py:6-28``): NER over ``{"guid",
    "text"}`` items (plain strings also accepted), enveloped response."""

    def process_core(self, data):
        from .serving import crf_process
        query_list = data["query_list"]
        if not isinstance(query_list, list):   # reference guard
            raise ValueError("query_list must be a list")
        texts = [q["text"] if isinstance(q, dict) else q for q in query_list]
        out = crf_process(texts)
        return {"predictions": out["predictions"], "query_list": query_list}


class MRCHTTPServer(KGEHTTPServer):
    """``MRCServer`` (``ner_server.py:34-56``): span extraction; the
    response is a bare list (the reference returns ``results`` unwrapped)."""

    def process_core(self, data):
        from .serving import mrc_process
        query_list = data["query_list"]
        if not isinstance(query_list, list):
            raise ValueError("query_list must be a list")
        items = [{"qas_id": q.get("qas_id", q.get("id")),
                  "question": q["question"], "context": q["context"]}
                 for q in query_list]
        return mrc_process(items)


class NREHTTPServer(KGEHTTPServer):
    """``NREAlbertServer`` (``nre_server.py:9-27``): relation extraction,
    enveloped ``{"relation", "score"}`` rows."""

    def process_core(self, data):
        from .serving import nre_process
        query_list = data["query_list"]
        if not isinstance(query_list, list):
            raise ValueError("query_list must be a list")
        preds = nre_process(query_list)
        return {"predictions": [{"relation": r, "score": s}
                                for r, s in preds],
                "query_list": query_list}


def request_server(query_list: list, uri: str, bsz: int = 8,
                   verbose: bool = False) -> list:
    """The reference client (``test/albertNER/eval_estimator.py:53-88``):
    split into ``bsz``-sized batches (M14), POST each, time the round trip,
    collect predictions in order.

    The reference client reads ``response["predictions"]`` — correct for
    the CRF/NRE envelopes; the MRC server returns a bare list (a latent
    client/server mismatch in the reference), so a list response is
    extended directly here.
    """
    batches = [query_list[i:i + bsz] for i in range(0, len(query_list), bsz)]
    results: list = []
    latencies: list[float] = []
    for batch in batches:
        req = urllib.request.Request(
            uri, method="POST",
            data=json.dumps({"query_list": batch}).encode("utf-8"),
            headers={"Content-type": "application/json"})
        t0 = time.time()
        with urllib.request.urlopen(req) as resp:
            body = json.loads(resp.read().decode("utf-8"))
        latencies.append(time.time() - t0)
        if verbose:                          # the reference prints t1-t0
            print("processed {} queries({}s)".format(len(batch),
                                                     latencies[-1]))
        results.extend(body["predictions"] if isinstance(body, dict)
                       else body)
    return results
