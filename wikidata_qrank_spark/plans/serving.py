"""Conditional-GET serving surface for published artifacts (§3.3).

Functional equivalent of the reference webserver's download handler
(cmd/webserver/main.go:101-140) and storage watcher
(cmd/webserver/storage.go:175-233): quoted ETags, If-None-Match → 304,
CORS headers incl. the OPTIONS pre-flight, HEAD support, 405 with
Allow for other methods, and a 30 s reload loop over the artifact
directory. Implemented as a transport-free handler — (method, path,
headers) → (status, headers, body_path) — so it unit-tests without a
socket and mounts trivially under any WSGI/ASGI server. ETag = md5 of
file bytes (the reference reuses the object store's md5-based ETag).
"""

from __future__ import annotations

import hashlib
import os
import time
from email.utils import formatdate

from .publish import latest_artifact

_CONTENT_TYPES = {
    ".csv": "text/csv",
    ".json": "application/json",
    ".gz": "application/gzip",
    ".zst": "application/zstd",
    ".txt": "text/plain",
}

# Landing page (reference: HandleMain, cmd/webserver/main.go:57-99 —
# same structural elements: project title, pointer to the README/design
# docs, the dateless /download/ alias, conditional-request hint, CC0
# dedication; text is our own).
_INDEX_HTML = """\
<html>
<head><title>Wikidata QRank</title></head>
<body>
<h1>Wikidata QRank</h1>
<p>QRank ranks Wikidata entities by aggregated page views across
Wikimedia projects. See the README and technical design document in the
source repository for background.</p>
<p>Download the latest data at <a href="/download/qrank.csv.gz">
/download/qrank.csv.gz</a>. The file is updated periodically; use
conditional requests (If-None-Match with the returned ETag) to check
for updates.</p>
<p>The QRank data is dedicated to the Public Domain via Creative
Commons Zero 1.0.</p>
</body></html>
"""

# Reference: HandleRobotsTxt (cmd/webserver/main.go:146-150) — a
# constant allow-all robots.txt, because the fronting proxy would
# otherwise inject a deny-all response.
_ROBOTS_TXT = "User-Agent: *\nAllow: /\n"

_PREFLIGHT_HEADERS = {
    "Allow": "GET, HEAD, OPTIONS",
    "Access-Control-Allow-Methods": "GET, HEAD, OPTIONS",
    "Access-Control-Allow-Headers": (
        "ETag, If-Match, If-None-Match, If-Modified-Since, If-Range, Range"
    ),
    "Access-Control-Allow-Origin": "*",
    "Access-Control-Expose-Headers": "ETag",
    "Access-Control-Max-Age": "86400",
}


def content_etag(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _content_type(name: str) -> str:
    _, ext = os.path.splitext(name)
    return _CONTENT_TYPES.get(ext, "application/octet-stream")


class ArtifactServer:
    """Serves the newest published artifacts with conditional GET.

    ``reload()`` rescans the directory (storage.go Reload); ``watch()``
    re-runs it every ``interval`` seconds (storage.go:175-191) until
    ``max_iterations`` — pass None to run forever in a real deployment.
    """

    def __init__(self, out_dir: str, basenames: tuple[str, ...] = ()):
        self.out_dir = out_dir
        self.basenames = basenames or ("qrank", "item_signals", "qrank-stats")
        self._files: dict[str, tuple[str, str, float]] = {}
        self.reload()

    def reload(self) -> None:
        files: dict[str, tuple[str, str, float]] = {}
        for base in self.basenames:
            path = latest_artifact(self.out_dir, base)
            if path is None:
                continue
            files[os.path.basename(path)] = (
                path,
                content_etag(path),
                os.path.getmtime(path),
            )
            # the dateless alias always points at the latest artifact
            _, ext = os.path.splitext(path)
            files[base + ext] = files[os.path.basename(path)]
        self._files = files

    def watch(self, interval: float = 30.0, max_iterations: int | None = None) -> None:
        n = 0
        while max_iterations is None or n < max_iterations:
            time.sleep(interval)
            self.reload()
            n += 1

    def handle(
        self, method: str, path: str, headers: dict[str, str] | None = None
    ) -> tuple[int, dict[str, str], str | bytes | None]:
        """(status, response_headers, body).

        ``body`` is a filesystem path for artifact downloads (streamed
        by the transport), inline ``bytes`` for the generated pages
        (index, robots.txt), or None."""
        headers = {k.lower(): v for k, v in (headers or {}).items()}
        if method == "OPTIONS":
            return 204, dict(_PREFLIGHT_HEADERS), None
        if method not in ("GET", "HEAD"):
            return 405, {"Allow": "GET, HEAD, OPTIONS"}, None
        if path == "/robots.txt":
            body = _ROBOTS_TXT.encode()
            hdrs = {
                "Content-Type": "text/plain",
                "Content-Length": str(len(body)),
            }
            return 200, hdrs, None if method == "HEAD" else body
        if not path.startswith("/download/"):
            # the reference registers HandleMain on "/" — Go's catch-all
            # pattern — so every non-download, non-robots path serves
            # the landing page (main.go:43,57)
            body = _INDEX_HTML.encode()
            hdrs = {
                "Content-Type": "text/html; charset=utf-8",
                "Content-Length": str(len(body)),
            }
            return 200, hdrs, None if method == "HEAD" else body
        name = path[len("/download/") :]
        entry = self._files.get(name)
        if entry is None:
            return 404, {}, None
        fpath, etag, mtime = entry
        out = {
            "ETag": f'"{etag}"',  # RFC 7232: ETag must be quoted
            "Content-Type": _content_type(name),
            # net/http reports the size on HEAD too — size-probing
            # clients rely on it before downloading multi-GB artifacts
            "Content-Length": str(os.path.getsize(fpath)),
            "Access-Control-Allow-Origin": "*",
            "Last-Modified": formatdate(mtime, usegmt=True),
        }
        inm = headers.get("if-none-match")
        if inm is not None:
            # RFC 7232 §3.2: If-None-Match uses WEAK comparison — strip
            # any W/ prefix before unquoting (intermediaries like nginx
            # gzip weaken ETags)
            candidates = set()
            for c in inm.split(","):
                c = c.strip()
                if c.startswith("W/"):
                    c = c[2:]
                candidates.add(c.strip('"'))
            if "*" in candidates or etag in candidates:
                return 304, out, None
        if method == "HEAD":
            return 200, out, None
        return 200, out, fpath


_REASONS = {
    200: "OK",
    204: "No Content",
    304: "Not Modified",
    404: "Not Found",
    405: "Method Not Allowed",
}


def wsgi_app(server: ArtifactServer):
    """WSGI binding for :class:`ArtifactServer` — the transport layer
    the reference implements with net/http (cmd/webserver/main.go:20-51).
    Bodies stream via ``wsgi.file_wrapper`` when the server provides one
    (sendfile under most servers), so multi-GB artifacts never buffer in
    Python memory."""

    def app(environ, start_response):
        method = environ.get("REQUEST_METHOD", "GET")
        path = environ.get("PATH_INFO", "/")
        headers = {
            k[5:].replace("_", "-").lower(): v
            for k, v in environ.items()
            if k.startswith("HTTP_")
        }
        status, hdrs, body_path = server.handle(method, path, headers)
        hdrs = dict(hdrs)
        body = [b""]
        if isinstance(body_path, bytes):
            body, body_path = [body_path], None
        if body_path is not None:
            hdrs["Content-Length"] = str(os.path.getsize(body_path))
            f = open(body_path, "rb")
            wrapper = environ.get("wsgi.file_wrapper")
            if wrapper:
                body = wrapper(f)  # server closes via the wrapper
            else:
                # generator: its close() (PEP 3333 cleanup hook) raises
                # GeneratorExit → finally closes the fd; a bare
                # iter(lambda...) has no close() and leaks descriptors
                def _stream(fh=f):
                    try:
                        while chunk := fh.read(1 << 16):
                            yield chunk
                    finally:
                        fh.close()

                body = _stream()
        start_response(
            f"{status} {_REASONS.get(status, '')}".rstrip(), sorted(hdrs.items())
        )
        return body

    return app


def serve_http(
    out_dir: str,
    port: int = 0,
    basenames: tuple[str, ...] = (),
    poll_interval: float = 30.0,
):
    """Bind the artifact server to a real socket (stdlib wsgiref — no
    extra dependency; production mounts :func:`wsgi_app` under any WSGI
    server). ``poll_interval > 0`` starts the reload watcher as a
    daemon thread (storage.go:175-191), so newly published artifact
    versions are served without intervention; pass 0 to manage
    ``server.reload()`` yourself. Returns ``(httpd, server)`` — caller
    runs ``httpd.serve_forever()``."""
    import threading
    from wsgiref.simple_server import make_server

    server = ArtifactServer(out_dir, basenames)
    httpd = make_server("127.0.0.1", port, wsgi_app(server))
    if poll_interval > 0:
        threading.Thread(
            target=server.watch, args=(poll_interval,), daemon=True
        ).start()
    return httpd, server
