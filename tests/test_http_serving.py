"""Live HTTP serving parity (reference nerservice/ surface, S11).

Each test boots the stdlib-transport server on an ephemeral localhost
port, drives it with the mirrored reference client
(`eval_estimator.py:53-88` semantics), and pins the wire result to the
direct batch serving function — so the HTTP layer can only ever be a
transparent transport over the same Ray Data stages.
"""

import json
import urllib.error
import urllib.request

import pytest

from knowledgeextraction_ray.pipelines.http_server import (
    CRFHTTPServer, MRCHTTPServer, NREHTTPServer, ServerConfig,
    request_server)


def _post(url: str, payload: dict):
    req = urllib.request.Request(
        url, method="POST", data=json.dumps(payload).encode("utf-8"),
        headers={"Content-type": "application/json"})
    with urllib.request.urlopen(req) as resp:
        assert resp.headers["Content-type"] == "application/json"
        return json.loads(resp.read().decode("utf-8"))


def test_crf_http_parity_and_envelope():
    """POST /methodCore with {"guid","text"} items == direct crf_process,
    wrapped in the CRFServer envelope (ner_server.py:11-28)."""
    from knowledgeextraction_ray.pipelines.serving import crf_process
    queries = [{"guid": "0", "text": "import utils"},
               {"guid": "1", "text": "def run(a):"}]
    with CRFHTTPServer() as srv:
        got = _post(srv.url, {"query_list": queries})
    want = crf_process([q["text"] for q in queries])
    assert set(got) == {"predictions", "query_list"}
    assert got["query_list"] == queries
    assert got["predictions"] == want["predictions"]
    assert got["predictions"][0]["words"] == list("import utils")
    assert got["predictions"][0]["tags"][7] == "IMPORT-B"


def test_mrc_http_returns_bare_list():
    """MRCServer returns the results list UNWRAPPED (ner_server.py:34-56);
    'id' is accepted as the guid key like build_example's entry["id"]."""
    from knowledgeextraction_ray.pipelines.serving import mrc_process
    items = [{"id": "q1", "question": "Which functions are defined?",
              "context": "def alpha(x):\n    v0 = beta(x)"}]
    with MRCHTTPServer() as srv:
        got = _post(srv.url, {"query_list": items})
    want = mrc_process([{"qas_id": "q1", "question": items[0]["question"],
                         "context": items[0]["context"]}])
    assert isinstance(got, list)
    assert got == json.loads(json.dumps(want))   # wire-typed equality
    assert got[0]["guid"] == "q1" and got[0]["entities"] == ["alpha"]


def test_nre_http_envelope():
    """NREAlbertServer envelope: {"relation","score"} rows + echo
    (nre_server.py:14-27)."""
    text = "def f(x):\n    y = g(x)"
    items = [{"text": text, "h": {"pos": [4, 5]}, "t": {"pos": [18, 19]}}]
    with NREHTTPServer() as srv:
        got = _post(srv.url, {"query_list": items})
    assert set(got) == {"predictions", "query_list"}
    assert got["query_list"] == items
    (row,) = got["predictions"]
    assert row["relation"] == "calls" and 0.5 <= row["score"] < 1.0


def test_client_batches_and_preserves_order():
    """request_server splits at bsz=8 (M14, eval_estimator.py:53) and the
    concatenated predictions stay in query order across batches."""
    queries = [{"guid": str(i), "text": f"import mod{i}"} for i in range(19)]
    with CRFHTTPServer() as srv:
        got = request_server(queries, srv.url, bsz=8)
    assert len(got) == 19
    for i, pred in enumerate(got):
        assert pred["words"] == list(f"import mod{i}")


def test_http_error_paths():
    """Unknown route -> 404; malformed body -> 500 (Tornado defaults)."""
    with CRFHTTPServer(ServerConfig(debug=True)) as srv:
        bad_route = srv.url.replace("/methodCore", "/nope")
        with pytest.raises(urllib.error.HTTPError) as e404:
            _post(bad_route, {"query_list": []})
        assert e404.value.code == 404
        req = urllib.request.Request(
            srv.url, method="POST", data=b"not json",
            headers={"Content-type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as e500:
            urllib.request.urlopen(req)
        assert e500.value.code == 500


def test_server_config_mirrors_tornado_json(tmp_path):
    """ServerConfig reads the reference's tornado_server.json key names."""
    p = tmp_path / "tornado_server.json"
    p.write_text(json.dumps({"listen_ip": "127.0.0.1", "port": 0,
                             "ServiceName": "tornado_server",
                             "debug": True}))
    cfg = ServerConfig.from_json(str(p))
    assert (cfg.listen_ip, cfg.port, cfg.service_name, cfg.debug) == \
        ("127.0.0.1", 0, "tornado_server", True)
