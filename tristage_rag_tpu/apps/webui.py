"""Web UI — chat, search, and document-embedding pages.

Functional parity with the reference Flask app (non_mcp/webui/app.py):
the same routes (`/`, POST `/search`, GET `/api/search`, POST `/add`,
`/chat` no-LLM answering from the top stage-3 passage with a score
footer, `/embed` + `/embed/run`, `/api/stats|clear|embedded|
documents-status`), query-word highlighting (:205-223), chunked
ingestion with the SHA-256 embedded-manifest (:71-133) — built on the
stdlib WSGI server instead of Flask (zero extra dependencies), serving
the single shared orchestrator.
"""

from __future__ import annotations

import html
import io
import json
import logging
import re
import secrets
import urllib.parse
from typing import Any, Callable, Optional

from tristage_rag_tpu.apps.chunker import chunk_text, extract_text
from tristage_rag_tpu.apps.cli import RetrievalApp

logger = logging.getLogger(__name__)

_STYLE = """
body{font-family:system-ui,sans-serif;margin:0;background:#f5f6fa;color:#1f2430}
header{background:#1f2430;color:#fff;padding:.7rem 1.2rem;display:flex;gap:1rem;align-items:center}
header a{color:#9fb4ff;text-decoration:none;margin-right:.8rem}
.pill{background:#2f3650;border-radius:999px;padding:.15rem .7rem;font-size:.8rem}
main{max-width:900px;margin:1.2rem auto;padding:0 1rem}
.card{background:#fff;border-radius:10px;padding:1rem 1.2rem;margin-bottom:1rem;box-shadow:0 1px 4px rgba(0,0,0,.08)}
.score{display:inline-block;background:#eef1ff;border-radius:6px;padding:.05rem .45rem;font-size:.75rem;margin-right:.3rem}
mark{background:#ffe79a}
input[type=text],textarea{width:100%;padding:.5rem;border:1px solid #ccd;border-radius:6px;box-sizing:border-box}
button{background:#3b5bdb;color:#fff;border:0;border-radius:6px;padding:.5rem 1rem;cursor:pointer}
.msg-user{text-align:right;color:#3b5bdb;margin:.4rem 0}
.msg-bot{background:#fff;border-radius:10px;padding:.7rem 1rem;margin:.4rem 0;box-shadow:0 1px 3px rgba(0,0,0,.06)}
small{color:#778}
"""


def _page(title: str, body: str, pills: str = "") -> str:
    return f"""<!doctype html><html><head><meta charset="utf-8">
<title>{html.escape(title)}</title><style>{_STYLE}</style></head><body>
<header><strong>TriStage-TPU</strong>
<nav><a href="/">Chat</a><a href="/search">Search</a><a href="/embed">Embed</a></nav>
<span style="flex:1"></span>{pills}</header>
<main>{body}</main></body></html>"""


def highlight(text: str, query: str) -> str:
    """<mark> query words, escaping around the matches
    (webui/app.py:205-223). Matching runs on the RAW text — matching
    after html.escape would let query words like 'amp'/'quot' hit
    inside entity bodies and corrupt the markup."""
    words = {w for w in re.findall(r"\w+", query.lower()) if len(w) > 1}
    if not words:
        return html.escape(text)
    pattern = re.compile(
        r"\b(" + "|".join(re.escape(w) for w in sorted(words, key=len, reverse=True)) + r")\b",
        re.IGNORECASE,
    )
    out, last = [], 0
    for m in pattern.finditer(text):
        out.append(html.escape(text[last : m.start()]))
        out.append(f"<mark>{html.escape(m.group(0))}</mark>")
        last = m.end()
    out.append(html.escape(text[last:]))
    return "".join(out)


class WebUI:
    """WSGI application over a RetrievalApp."""

    def __init__(self, app: RetrievalApp, chunk_size: int = 1000, overlap: int = 200):
        self.app = app
        self.chunk_size = chunk_size
        self.overlap = overlap
        self._chats: dict[str, list[dict[str, str]]] = {}

    # ---- WSGI plumbing ---------------------------------------------------

    def __call__(self, environ, start_response):
        try:
            method = environ["REQUEST_METHOD"]
            path = environ.get("PATH_INFO", "/")
            query = urllib.parse.parse_qs(environ.get("QUERY_STRING", ""))
            handler = self._route(method, path)
            if handler is None:
                return self._respond(start_response, "404 Not Found",
                                     _page("404", "<p>not found</p>"))
            return handler(environ, start_response, query)
        except Exception as e:
            logger.exception("webui error")
            return self._respond(
                start_response, "500 Internal Server Error",
                _page("error", f"<p>error: {html.escape(str(e))}</p>"),
            )

    def _route(self, method: str, path: str) -> Optional[Callable]:
        table = {
            ("GET", "/"): self.chat_page,
            ("POST", "/chat"): self.chat_post,
            ("POST", "/chat/clear"): self.chat_clear,
            ("GET", "/search"): self.search_page,
            ("POST", "/search"): self.search_post,
            ("GET", "/api/search"): self.api_search,
            ("POST", "/add"): self.add_post,
            ("GET", "/embed"): self.embed_page,
            ("POST", "/embed/run"): self.embed_run,
            ("GET", "/api/stats"): self.api_stats,
            ("POST", "/api/clear"): self.api_clear,
            ("POST", "/api/delete"): self.api_delete,
            ("GET", "/api/embedded"): self.api_embedded,
            ("GET", "/api/documents-status"): self.api_documents_status,
        }
        return table.get((method, path))

    @staticmethod
    def _respond(start_response, status: str, body: str,
                 ctype: str = "text/html; charset=utf-8", headers=None):
        data = body.encode("utf-8")
        hs = [("Content-Type", ctype), ("Content-Length", str(len(data)))]
        if headers:
            hs.extend(headers)
        start_response(status, hs)
        return [data]

    def _json(self, start_response, payload: Any, status: str = "200 OK"):
        return self._respond(
            start_response, status, json.dumps(payload, default=str),
            ctype="application/json",
        )

    @staticmethod
    def _form(environ) -> dict[str, Any]:
        try:
            length = int(environ.get("CONTENT_LENGTH") or 0)
        except ValueError:
            length = 0
        body = environ["wsgi.input"].read(length) if length else b""
        ctype = environ.get("CONTENT_TYPE", "")
        if ctype.startswith("multipart/form-data"):
            return WebUI._parse_multipart(body, ctype)
        parsed = urllib.parse.parse_qs(body.decode("utf-8", errors="replace"))
        return {k: v[0] for k, v in parsed.items()}

    @staticmethod
    def _parse_multipart(body: bytes, ctype: str) -> dict[str, Any]:
        m = re.search(r'boundary="?([^";]+)"?', ctype)
        if not m:
            return {}
        boundary = m.group(1).encode()
        out: dict[str, Any] = {}
        files: list[tuple[str, bytes]] = []
        for part in body.split(b"--" + boundary):
            part = part.strip(b"\r\n")
            if not part or part == b"--":
                continue
            if b"\r\n\r\n" not in part:
                continue
            head, _, payload = part.partition(b"\r\n\r\n")
            head_text = head.decode("utf-8", errors="replace")
            name_m = re.search(r'name="([^"]+)"', head_text)
            file_m = re.search(r'filename="([^"]*)"', head_text)
            if name_m is None:
                continue
            if file_m and file_m.group(1):
                files.append((file_m.group(1), payload))
            else:
                out[name_m.group(1)] = payload.decode("utf-8", errors="replace")
        if files:
            out["__files__"] = files
        return out

    _MAX_CHAT_SESSIONS = 500

    def _session(
        self, environ, create: bool = False
    ) -> tuple[str, list[dict[str, str]], Optional[tuple]]:
        """``create=False`` never stores anything — cookie-less probes
        (health checks, crawlers) must not grow ``_chats`` unboundedly.
        Only a posted chat message (create=True) persists a session,
        and the oldest sessions are evicted past a cap."""
        cookies = environ.get("HTTP_COOKIE", "")
        m = re.search(r"tsid=([a-f0-9]{32})", cookies)
        header = None
        if m:
            sid = m.group(1)
        else:
            sid = secrets.token_hex(16)
            header = ("Set-Cookie", f"tsid={sid}; Path=/; HttpOnly")
        if create:
            history = self._chats.setdefault(sid, [])
            while len(self._chats) > self._MAX_CHAT_SESSIONS:
                self._chats.pop(next(iter(self._chats)))
        else:
            history = self._chats.get(sid, [])
        return sid, history, header

    def _pills(self) -> str:
        stats = self.app.docs.stats()
        n_searches = len(self.app.search_history)
        return (
            f'<span class="pill">docs: {stats["total_documents"]}</span>'
            f'<span class="pill">searches: {n_searches}</span>'
        )

    # ---- chat ------------------------------------------------------------

    def chat_page(self, environ, start_response, query):
        sid, history, cookie = self._session(environ)
        msgs = "".join(
            f'<div class="msg-user">{html.escape(m["text"])}</div>'
            if m["role"] == "user"
            else f'<div class="msg-bot">{m["html"]}</div>'
            for m in history
        )
        body = f"""
<div class="card"><form method="post" action="/chat">
<input type="text" name="message" placeholder="Ask about your documents..." autofocus>
<p><button>Send</button>
<button formaction="/chat/clear" formnovalidate>Clear chat</button></p>
</form></div>{msgs}"""
        headers = [cookie] if cookie else None
        return self._respond(start_response, "200 OK",
                             _page("Chat", body, self._pills()), headers=headers)

    def chat_post(self, environ, start_response, query):
        sid, history, cookie = self._session(environ, create=True)
        msg = self._form(environ).get("message", "").strip()
        if msg:
            history.append({"role": "user", "text": msg})
            out = self.app.search(msg)
            if out["results"]:
                top = out["results"][0]
                source = top.get("metadata", {}).get("source", "unknown")
                answer = (
                    highlight(top["document"][:1200], msg)
                    + f'<br><small>[{html.escape(str(source))}]'
                      f'[stage3_score={top.get("stage3_score", 0):.4f}]</small>'
                )
            else:
                answer = "<em>No relevant passages found.</em>"
            history.append({"role": "bot", "html": answer})
        headers = [("Location", "/")] + ([cookie] if cookie else [])
        start_response("303 See Other", headers)
        return [b""]

    def chat_clear(self, environ, start_response, query):
        sid, history, cookie = self._session(environ)
        history.clear()
        headers = [("Location", "/")] + ([cookie] if cookie else [])
        start_response("303 See Other", headers)
        return [b""]

    # ---- search ----------------------------------------------------------

    def _render_results(self, out: dict[str, Any], query: str) -> str:
        t = out["timing"]
        times = " ".join(
            f'{k.split("_")[0]}={t[k] * 1e3:.0f}ms'
            for k in ("stage1_time", "stage2_time", "stage3_time", "total_time")
            if t.get(k) is not None
        )
        cards = []
        for rank, r in enumerate(out["results"], 1):
            chips = "".join(
                f'<span class="score">{name}={r[key]:.4f}</span>'
                for name, key in (
                    ("final", "stage3_score"), ("s1", "stage1_score"),
                    ("s2", "stage2_score"), ("s3", "stage3_score"),
                )
                if key in r
            )
            cards.append(
                f'<div class="card"><strong>#{rank}</strong> {chips}'
                f"<p>{highlight(r['document'][:800], query)}</p></div>"
            )
        return f"<p><small>{times}</small></p>" + "".join(cards)

    def search_page(self, environ, start_response, query):
        q = (query.get("q") or [""])[0]
        results_html = ""
        if q:
            results_html = self._render_results(self.app.search(q), q)
        body = f"""
<div class="card"><form method="get" action="/search">
<input type="text" name="q" value="{html.escape(q, quote=True)}" placeholder="Search query...">
<p><button>Search</button></p></form></div>{results_html}
<div class="card"><form method="post" action="/add">
<textarea name="text" rows="4" placeholder="Paste documents to add (blank line separates)"></textarea>
<p><button>Add documents</button></p></form></div>"""
        return self._respond(start_response, "200 OK",
                             _page("Search", body, self._pills()))

    def search_post(self, environ, start_response, query):
        q = self._form(environ).get("query", "").strip()
        start_response("303 See Other",
                       [("Location", f"/search?q={urllib.parse.quote(q)}")])
        return [b""]

    def api_search(self, environ, start_response, query):
        q = (query.get("q") or [""])[0]
        if not q:
            return self._json(start_response, {"error": "missing q"},
                              "400 Bad Request")
        try:
            top_k = int((query.get("top_k") or ["20"])[0])
        except ValueError:
            return self._json(
                start_response, {"error": "top_k must be an integer"},
                "400 Bad Request",
            )
        out = self.app.search(q, top_k)
        return self._json(
            start_response,
            {"query": q, "results": out["results"], "timing": out["timing"]},
        )

    # ---- ingestion -------------------------------------------------------

    def _ingest_text(self, text: str, source: str) -> int:
        chunks = chunk_text(text, self.chunk_size, self.overlap)
        fresh = [c for c in chunks if not self.app.docs.is_embedded(c)]
        added = self.app.add_documents(fresh, source=source)
        self.app.docs.mark_embedded(fresh)
        return added

    def add_post(self, environ, start_response, query):
        form = self._form(environ)
        added = 0
        if form.get("text", "").strip():
            for block in form["text"].split("\n\n"):
                if block.strip():
                    added += self._ingest_text(block.strip(), "webui")
        for fname, payload in form.get("__files__", []):
            try:
                import tempfile, os

                suffix = "." + fname.rsplit(".", 1)[-1] if "." in fname else ".txt"
                with tempfile.NamedTemporaryFile(suffix=suffix, delete=False) as f:
                    f.write(payload)
                    tmp = f.name
                try:
                    added += self._ingest_text(extract_text(tmp), fname)
                finally:
                    os.unlink(tmp)
            except Exception as e:
                logger.warning("failed to ingest %s: %s", fname, e)
        start_response("303 See Other", [("Location", "/search")])
        return [b""]

    def embed_page(self, environ, start_response, query):
        body = f"""
<div class="card"><h3>Embed documents</h3>
<form method="post" action="/embed/run" enctype="multipart/form-data">
<p>Chunk size <input type="text" name="chunk_size" value="{self.chunk_size}" style="width:6rem">
Overlap <input type="text" name="overlap" value="{self.overlap}" style="width:6rem"></p>
<p><input type="file" name="file" multiple></p>
<p>Or a server-side directory:
<input type="text" name="dir" placeholder="/path/to/docs" style="width:20rem"></p>
<p><button name="action" value="upload">Embed</button></p>
</form>
<p><small>embedded chunks so far: {self.app.docs.embedded_count()}</small></p></div>"""
        return self._respond(start_response, "200 OK",
                             _page("Embed", body, self._pills()))

    def embed_run(self, environ, start_response, query):
        form = self._form(environ)
        try:
            self.chunk_size = int(form.get("chunk_size", self.chunk_size))
            self.overlap = int(form.get("overlap", self.overlap))
        except ValueError:
            pass
        added = 0
        for fname, payload in form.get("__files__", []):
            # route through extract_text like /add: PDFs/DOCX are binary
            # and must not be utf-8-decoded into mojibake
            try:
                import os
                import tempfile

                suffix = "." + fname.rsplit(".", 1)[-1] if "." in fname else ".txt"
                with tempfile.NamedTemporaryFile(suffix=suffix, delete=False) as f:
                    f.write(payload)
                    tmp = f.name
                try:
                    added += self._ingest_text(extract_text(tmp), fname)
                finally:
                    os.unlink(tmp)
            except Exception as e:
                logger.warning("embed failed for %s: %s", fname, e)
        # server-side directory ingest (reference's repo_all action,
        # webui/app.py:375-486)
        directory = form.get("dir", "").strip()
        if directory:
            from pathlib import Path

            from tristage_rag_tpu.apps.chunker import extract_text

            base = Path(directory)
            if base.is_dir():
                for f in sorted(base.rglob("*")):
                    if f.is_file() and f.suffix.lower() in (
                        ".txt", ".md", ".markdown", ".json",
                    ):
                        try:
                            added += self._ingest_text(extract_text(f), str(f))
                        except Exception as e:
                            logger.warning("embed failed for %s: %s", f, e)
            else:
                logger.warning("embed dir not found: %s", directory)
        start_response("303 See Other", [("Location", "/embed")])
        return [b""]

    # ---- JSON APIs -------------------------------------------------------

    def api_stats(self, environ, start_response, query):
        return self._json(start_response, {
            "documents": self.app.docs.stats(),
            "embedded_chunks": self.app.docs.embedded_count(),
            "searches": len(self.app.search_history),
            "performance": self.app.pipeline.performance_stats,
        })

    def api_clear(self, environ, start_response, query):
        self.app.clear_all_data()
        return self._json(start_response, {"status": "cleared"})

    def api_delete(self, environ, start_response, query):
        try:
            length = int(environ.get("CONTENT_LENGTH") or 0)
            payload = json.loads(
                environ["wsgi.input"].read(length).decode() or "{}"
            )
            doc_ids = payload.get("doc_ids", [])
            if not isinstance(doc_ids, list):
                raise ValueError("doc_ids must be a list")
            doc_ids = [int(i) for i in doc_ids]
        except (ValueError, TypeError, json.JSONDecodeError) as e:
            return self._json(
                start_response, {"error": str(e)}, "400 Bad Request"
            )
        # Route through the app (not the pipeline directly) so the
        # tombstones are persisted via save_index() and survive restart,
        # matching the CLI delete path.
        n = self.app.delete_documents(doc_ids)
        return self._json(start_response, {
            "documents_deleted": n,
            "live_documents": (
                self.app.pipeline.stage1.index.live_count
                if self.app.pipeline.stage1 and self.app.pipeline.stage1.index
                else 0
            ),
        })

    def api_embedded(self, environ, start_response, query):
        return self._json(start_response,
                          {"embedded_chunks": self.app.docs.embedded_count()})

    def api_documents_status(self, environ, start_response, query):
        return self._json(start_response, {
            "total_documents": len(self.app.docs.documents),
            "sources": self.app.docs.stats()["sources"],
            "indexed": self.app.pipeline.get_document_count(),
        })


def serve(app: RetrievalApp, host: str = "127.0.0.1", port: int = 5000) -> None:
    from wsgiref.simple_server import make_server

    ui = WebUI(app)
    try:
        # pay the XLA compiles before accepting requests (the CLI stays
        # lazy; a server should come up warm)
        app.pipeline.warmup()
    except Exception:
        logger.exception("warmup failed; serving cold")
    with make_server(host, port, ui) as httpd:
        logger.info("web UI listening on http://%s:%d", host, port)
        print(f"web UI: http://{host}:{port}")
        httpd.serve_forever()
