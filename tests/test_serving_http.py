"""Socket-level test of the HTTP binding: the reference webserver's
day-one path (cmd/webserver/main.go:20-51) — GET/HEAD/304/OPTIONS/405
over a real TCP connection."""

from __future__ import annotations

import http.client
import threading


def _start(tmp_path):
    from wikidata_qrank_spark.plans.serving import serve_http

    (tmp_path / "qrank-20240301.csv").write_bytes(b"Entity,QRank\nQ1,5\n")
    httpd, server = serve_http(str(tmp_path), port=0, basenames=("qrank",))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd, server, httpd.server_address[1]


def test_http_get_head_304_options_405(tmp_path):
    httpd, server, port = _start(tmp_path)
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)

        conn.request("GET", "/download/qrank.csv")
        r = conn.getresponse()
        body = r.read()
        assert r.status == 200
        assert body == b"Entity,QRank\nQ1,5\n"
        assert r.getheader("Content-Length") == str(len(body))
        etag = r.getheader("ETag")
        assert etag.startswith('"') and etag.endswith('"')
        assert r.getheader("Access-Control-Allow-Origin") == "*"

        # conditional GET with the exact ETag → 304, empty body
        conn.request("GET", "/download/qrank.csv", headers={"If-None-Match": etag})
        r = conn.getresponse()
        assert r.status == 304
        assert r.read() == b""

        # weak comparison (a gzip-weakened intermediary ETag) → still 304
        conn.request(
            "GET", "/download/qrank.csv", headers={"If-None-Match": "W/" + etag}
        )
        r = conn.getresponse()
        assert r.status == 304 and r.read() == b""

        conn.request("HEAD", "/download/qrank.csv")
        r = conn.getresponse()
        assert r.status == 200
        assert r.read() == b""

        conn.request("OPTIONS", "/download/qrank.csv")
        r = conn.getresponse()
        r.read()
        assert r.status == 204
        assert "GET" in r.getheader("Access-Control-Allow-Methods")

        conn.request("POST", "/download/qrank.csv", body=b"x")
        r = conn.getresponse()
        r.read()
        assert r.status == 405
        assert r.getheader("Allow") == "GET, HEAD, OPTIONS"

        conn.request("GET", "/download/nope.csv")
        r = conn.getresponse()
        r.read()
        assert r.status == 404
    finally:
        httpd.shutdown()


def test_http_index_and_robots(tmp_path):
    """Reference HandleMain + HandleRobotsTxt (main.go:57-99,146-150):
    GET / serves the HTML landing page (and, like Go's "/" catch-all
    pattern, so does any other non-download path); /robots.txt is the
    constant allow-all file."""
    httpd, server, port = _start(tmp_path)
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)

        conn.request("GET", "/")
        r = conn.getresponse()
        body = r.read()
        assert r.status == 200
        assert r.getheader("Content-Type").startswith("text/html")
        assert b"Wikidata QRank" in body
        assert b"/download/qrank.csv.gz" in body

        conn.request("GET", "/robots.txt")
        r = conn.getresponse()
        body = r.read()
        assert r.status == 200
        assert r.getheader("Content-Type") == "text/plain"
        assert body == b"User-Agent: *\nAllow: /\n"

        # Go's "/" pattern catches every unmatched path → landing page
        conn.request("GET", "/some/other/page")
        r = conn.getresponse()
        assert r.status == 200 and b"Wikidata QRank" in r.read()

        conn.request("HEAD", "/robots.txt")
        r = conn.getresponse()
        assert r.status == 200 and r.read() == b""
        assert r.getheader("Content-Length") == str(
            len(b"User-Agent: *\nAllow: /\n")
        )
    finally:
        httpd.shutdown()


def test_http_serves_new_version_after_reload(tmp_path):
    httpd, server, port = _start(tmp_path)
    try:
        (tmp_path / "qrank-20240401.csv").write_bytes(b"Entity,QRank\nQ2,9\n")
        server.reload()
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        conn.request("GET", "/download/qrank.csv")
        r = conn.getresponse()
        assert r.read() == b"Entity,QRank\nQ2,9\n"
        # the dated name of the new version is served too
        conn.request("GET", "/download/qrank-20240401.csv")
        r = conn.getresponse()
        assert r.status == 200 and r.read() == b"Entity,QRank\nQ2,9\n"
    finally:
        httpd.shutdown()


def test_http_head_reports_content_length_and_watcher_reloads(tmp_path):
    import time

    from wikidata_qrank_spark.plans.serving import serve_http

    (tmp_path / "qrank-20240301.csv").write_bytes(b"Entity,QRank\nQ1,5\n")
    httpd, server = serve_http(
        str(tmp_path), port=0, basenames=("qrank",), poll_interval=0.05
    )
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", httpd.server_address[1], timeout=10)
        conn.request("HEAD", "/download/qrank.csv")
        r = conn.getresponse()
        r.read()
        assert r.status == 200
        assert r.getheader("Content-Length") == "18"  # size without a body
        # the watcher thread picks up a newly published version on its own
        (tmp_path / "qrank-20240401.csv").write_bytes(b"Entity,QRank\nQ2,9\n")
        deadline = time.time() + 10
        body = b""
        while time.time() < deadline and body != b"Entity,QRank\nQ2,9\n":
            conn.request("GET", "/download/qrank.csv")
            body = conn.getresponse().read()
            time.sleep(0.05)
        assert body == b"Entity,QRank\nQ2,9\n"
    finally:
        httpd.shutdown()
