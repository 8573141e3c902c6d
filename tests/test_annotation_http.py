"""Live annotation-tool clients against in-process fake servers.

The sandbox has no egress, so the Doccano / Label Studio REST clients
(kgkit/sources/annotation_http.py) are exercised end-to-end over REAL
HTTP against fakes that implement the same endpoints over an in-memory
store — auth, project lifecycle, label registration, import/export.
The Spark glue roundtrip (upload_df -> download_df) is the S6 contract:
what goes up must come back tag-identical."""

from __future__ import annotations

import http.server
import json
import threading

import pytest


class _FakeAnnotationServer:
    """One fake serving BOTH tool APIs (they never overlap on paths)."""

    def __init__(self):
        self.projects = []          # {id, name/title, rows/tasks, labels}
        self.token = "tok-123"
        store = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):  # noqa: N802
                pass

            def _send(self, obj, raw: bytes = None):
                body = raw if raw is not None else json.dumps(obj).encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _payload(self):
                n = int(self.headers.get("Content-Length", 0))
                return json.loads(self.rfile.read(n)) if n else None

            def _auth_ok(self):
                return self.headers.get("Authorization", "").startswith("Token ")

            def do_POST(self):  # noqa: N802
                p = self.path
                if p == "/v1/auth/login":
                    body = self._payload()
                    assert body["username"] and body["password"]
                    return self._send({"token": store.token})
                if not self._auth_ok():
                    self.send_response(401)
                    self.end_headers()
                    return None
                if p in ("/v1/projects", "/api/projects"):
                    body = self._payload()
                    proj = {
                        "id": len(store.projects) + 1,
                        "name": body.get("name"),
                        "title": body.get("title"),
                        "label_config": body.get("label_config", ""),
                        "labels": [], "rows": [], "tasks": [],
                    }
                    store.projects.append(proj)
                    return self._send(proj)
                if p.startswith("/v1/projects/") and p.endswith("/span-types"):
                    pid = int(p.split("/")[3])
                    store.projects[pid - 1]["labels"].append(self._payload())
                    return self._send({})
                if p.startswith("/v1/projects/") and p.endswith("/upload"):
                    pid = int(p.split("/")[3])
                    body = self._payload()
                    assert body["format"] == "JSONL"
                    store.projects[pid - 1]["rows"].extend(body["rows"])
                    return self._send({})
                if p.startswith("/api/projects/") and p.endswith("/import"):
                    pid = int(p.split("/")[3])
                    store.projects[pid - 1]["tasks"].extend(self._payload())
                    return self._send({"task_count": 1})
                self.send_response(404)
                self.end_headers()
                return None

            def do_GET(self):  # noqa: N802
                p = self.path
                if not self._auth_ok():
                    self.send_response(401)
                    self.end_headers()
                    return None
                if p == "/api/version":
                    return self._send({"version": "fake"})
                if p in ("/v1/projects", "/api/projects"):
                    return self._send({"results": store.projects})
                if p.startswith("/v1/projects/") and "/download" in p:
                    pid = int(p.split("/")[3])
                    lines = "\n".join(
                        json.dumps(r) for r in store.projects[pid - 1]["rows"]
                    )
                    return self._send(None, raw=lines.encode())
                if p.startswith("/api/projects/") and "/export" in p:
                    pid = int(p.split("/")[3])
                    return self._send(store.projects[pid - 1]["tasks"])
                self.send_response(404)
                self.end_headers()
                return None

        self.server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.thread = threading.Thread(target=self.server.serve_forever, daemon=True)
        self.thread.start()
        self.url = f"http://127.0.0.1:{self.server.server_port}"

    def stop(self):
        self.server.shutdown()


@pytest.fixture()
def fake_server():
    s = _FakeAnnotationServer()
    yield s
    s.stop()


ROWS = [
    (0, "arbetsförmedlingen finns i stockholm",
     [(0, 18, "arbetsförmedlingen", "ORG"), (27, 36, "stockholm", "LOC")]),
    (1, "spark hash join", [(0, 5, "spark", "TECH"), (6, 15, "hash join", "OP")]),
    (2, "no entities here", []),
]
SCHEMA = ("line_id long, text string, tags array<struct<"
          "char_start:int,char_end:int,token:string,tag:string>>")


class TestDoccanoHttp:
    def test_upload_download_roundtrip(self, spark, fake_server):
        from kgkit.sources.annotation_http import (
            DoccanoHttp, download_df, upload_df,
        )

        tool = DoccanoHttp(fake_server.url, "admin", "pw")
        assert tool.connected
        df = spark.createDataFrame(ROWS, SCHEMA)
        upload_df(df, tool, "batch_1")
        back = download_df(spark, tool, "batch_1")
        got = {
            r["text"]: [tuple(t) for t in r["tags"]] for r in back.collect()
        }
        want = {
            text: [(cs, ce, tok, tag) for cs, ce, tok, tag in tags]
            for _, text, tags in ROWS
        }
        assert got == want

    def test_upload_registers_labels_and_refuses_duplicates(
        self, spark, fake_server
    ):
        from kgkit.sources.annotation_http import DoccanoHttp, upload_df

        tool = DoccanoHttp(fake_server.url, "admin", "pw")
        df = spark.createDataFrame(ROWS, SCHEMA)
        upload_df(df, tool, "batch_1")
        labels = {
            lbl["text"] for lbl in fake_server.projects[0]["labels"]
        }
        assert labels == {"ORG", "LOC", "TECH", "OP"}
        with pytest.raises(ValueError, match="already exists"):
            upload_df(df, tool, "batch_1")

    def test_download_requires_exactly_one_project(self, fake_server):
        from kgkit.sources.annotation_http import DoccanoHttp

        tool = DoccanoHttp(fake_server.url, "admin", "pw")
        with pytest.raises(ValueError, match="expected 1"):
            tool.download("missing")

    def test_bad_login_sets_disconnected(self):
        from kgkit.sources.annotation_http import DoccanoHttp

        tool = DoccanoHttp("http://127.0.0.1:9", "admin", "pw")
        assert not tool.connected


class TestLabelStudioHttp:
    def test_upload_download_roundtrip(self, spark, fake_server):
        from kgkit.sources.annotation_http import (
            LabelStudioHttp, download_df, upload_df,
        )

        tool = LabelStudioHttp(fake_server.url, "api-key")
        assert tool.connected
        df = spark.createDataFrame(ROWS, SCHEMA)
        upload_df(df, tool, "batch_ls")
        back = download_df(spark, tool, "batch_ls")
        got = {
            r["text"]: [tuple(t) for t in r["tags"]] for r in back.collect()
        }
        want = {
            text: [(cs, ce, tok, tag) for cs, ce, tok, tag in tags]
            for _, text, tags in ROWS
        }
        assert got == want

    def test_label_config_built_from_data(self, spark, fake_server):
        from kgkit.sources.annotation_http import LabelStudioHttp, upload_df

        tool = LabelStudioHttp(fake_server.url, "api-key")
        df = spark.createDataFrame(ROWS, SCHEMA)
        upload_df(df, tool, "batch_ls")
        cfg = fake_server.projects[0]["label_config"]
        for lbl in ("ORG", "LOC", "TECH", "OP"):
            assert f'value="{lbl}"' in cfg
