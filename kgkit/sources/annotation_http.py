"""S6 — live annotation-tool clients (Doccano / Label Studio) over HTTP.

The reference drives both tools through their SDKs
(nerblackbox/modules/annotation/annotation_tool_base.py:14-234,
annotation_tool_doccano.py:16-152, annotation_tool_labelstudio.py:20-150);
the SDKs are thin REST wrappers, so this module implements the same
observable lifecycle over urllib directly — no extra dependencies, and
an injectable opener so the full upload→download roundtrip is testable
against an in-process fake server (tests/test_annotation_http.py) in a
sandbox with no egress.  Against a real deployment the default opener
talks to the same endpoints the SDKs call.

Lifecycle parity with AnnotationToolBase:
  * ``upload(project_name, rows)`` requires the project NOT exist
    yet, creates it, registers the label set, converts
    nerblackbox→tool format, uploads (base.py:188-234).
  * ``download(project_name)`` requires EXACTLY ONE project match
    (both raise ValueError otherwise),
    exports, converts tool→nerblackbox format (base.py:159-186).
  * label colors follow the reference's deterministic palette idea
    (annotation/colors.py): a fixed color per label-name hash.

Scale note: annotation batches are human-curated (10^3..10^5 rows) —
the reference itself holds them in memory — so the Spark glue
(``upload_df`` / ``download_df``) moves rows through the driver by
design; the corpus-scale path is the parquet/JSONL formats module.
"""

from __future__ import annotations

import hashlib
import json
import urllib.request
from typing import Callable, Dict, List, Optional

_COLORS = [  # fixed 8-color palette; label -> md5-stable pick
    "#FF6B6B", "#4ECDC4", "#45B7D1", "#FDCB6E",
    "#6C5CE7", "#00B894", "#E17055", "#74B9FF",
]


def label_color(label: str) -> str:
    h = int(hashlib.md5(label.encode()).hexdigest()[:4], 16)
    return _COLORS[h % len(_COLORS)]


class JsonTransport:
    """Minimal JSON-over-HTTP transport with an injectable opener."""

    def __init__(self, base_url: str, opener: Optional[Callable] = None):
        self.base_url = base_url.rstrip("/")
        self.headers: Dict[str, str] = {}
        self._open = opener or urllib.request.urlopen

    def request(self, method: str, path: str, payload=None, raw: bool = False):
        data = None
        headers = dict(self.headers)
        if payload is not None:
            data = json.dumps(payload).encode("utf-8")
            headers["Content-Type"] = "application/json"
        req = urllib.request.Request(
            f"{self.base_url}{path}", data=data, headers=headers, method=method
        )
        with self._open(req) as resp:
            body = resp.read()
        if raw:
            return body
        return json.loads(body) if body else None


class DoccanoHttp:
    """Doccano REST client (the endpoints doccano_client wraps)."""

    def __init__(self, base_url: str, username: str, password: str,
                 transport: Optional[JsonTransport] = None):
        self.t = transport or JsonTransport(base_url)
        self.connected = False
        try:
            tok = self.t.request(
                "POST", "/v1/auth/login",
                {"username": username, "password": password},
            )["token"]
            self.t.headers["Authorization"] = f"Token {tok}"
            self.connected = True
        except Exception:  # noqa: BLE001 — reference prints and proceeds
            self.connected = False

    def list_projects(self) -> List[dict]:
        out = self.t.request("GET", "/v1/projects")
        return out["results"] if isinstance(out, dict) else out

    def projects_named(self, name: str) -> List[dict]:
        return [p for p in self.list_projects() if p["name"] == name]

    def create_project(self, name: str) -> dict:
        return self.t.request(
            "POST", "/v1/projects",
            {"name": name, "project_type": "SequenceLabeling",
             "description": "description"},
        )

    def create_span_type(self, project_id: int, text: str, color: str) -> None:
        self.t.request(
            "POST", f"/v1/projects/{project_id}/span-types",
            {"text": text, "color": color},
        )

    def upload_rows(self, project_id: int, rows: List[dict]) -> None:
        """JSONL sequence-labeling upload (the SDK's upload(...,
        'SequenceLabeling', 'JSONL', 'text', 'label') call)."""
        self.t.request(
            "POST", f"/v1/projects/{project_id}/upload",
            {"format": "JSONL", "column_data": "text",
             "column_label": "label", "rows": rows},
        )

    def download_rows(self, project_id: int) -> List[dict]:
        body = self.t.request(
            "GET", f"/v1/projects/{project_id}/download?format=JSONL", raw=True
        )
        return [json.loads(l) for l in body.decode("utf-8").splitlines() if l]

    # -- AnnotationToolBase lifecycle ---------------------------------------
    def upload(self, project_name: str, rows: List[dict]) -> None:
        if self.projects_named(project_name):
            # explicit raise, not assert: this guards a LIVE tool against
            # duplicate project creation and must survive python -O
            raise ValueError(f"project {project_name} already exists")
        project = self.create_project(project_name)
        labels = sorted({
            t[2] if isinstance(t, (list, tuple)) else t["label"]
            for r in rows for t in r.get("label", [])
        })
        for name in labels:
            self.create_span_type(project["id"], name, label_color(name))
        self.upload_rows(project["id"], rows)

    def download(self, project_name: str) -> List[dict]:
        projects = self.projects_named(project_name)
        if len(projects) != 1:
            raise ValueError(
                f"found {len(projects)} projects named {project_name}, expected 1"
            )
        return self.download_rows(projects[0]["id"])


class LabelStudioHttp:
    """Label Studio REST client (the endpoints label_studio_sdk wraps)."""

    def __init__(self, base_url: str, api_key: str,
                 transport: Optional[JsonTransport] = None):
        self.t = transport or JsonTransport(base_url)
        self.t.headers["Authorization"] = f"Token {api_key}"
        self.connected = False
        try:
            self.t.request("GET", "/api/version")
            self.connected = True
        except Exception:  # noqa: BLE001
            self.connected = False

    def list_projects(self) -> List[dict]:
        out = self.t.request("GET", "/api/projects")
        return out["results"] if isinstance(out, dict) else out

    def projects_named(self, title: str) -> List[dict]:
        return [p for p in self.list_projects() if p["title"] == title]

    def create_project(self, title: str, labels: List[str]) -> dict:
        # the reference builds a <View> label config from the label set
        # (annotation_tool_labelstudio.py upload step)
        tags = "".join(
            f'<Label value="{name}" background="{label_color(name)}"/>'
            for name in labels
        )
        cfg = (
            '<View><Labels name="label" toName="text">' + tags +
            '</Labels><Text name="text" value="$text"/></View>'
        )
        return self.t.request(
            "POST", "/api/projects", {"title": title, "label_config": cfg}
        )

    def import_tasks(self, project_id: int, tasks: List[dict]) -> None:
        self.t.request("POST", f"/api/projects/{project_id}/import", tasks)

    def export_tasks(self, project_id: int) -> List[dict]:
        return self.t.request(
            "GET", f"/api/projects/{project_id}/export?exportType=JSON"
        )

    # -- AnnotationToolBase lifecycle ---------------------------------------
    def upload(self, project_name: str, tasks: List[dict]) -> None:
        if self.projects_named(project_name):
            # explicit raise, not assert: this guards a LIVE tool against
            # duplicate project creation and must survive python -O
            raise ValueError(f"project {project_name} already exists")
        labels = sorted({
            lbl
            for task in tasks
            for ann in task.get("annotations", [])
            for r in ann.get("result", [])
            for lbl in r.get("value", {}).get("labels", [])
        })
        project = self.create_project(project_name, labels)
        self.import_tasks(project["id"], tasks)

    def download(self, project_name: str) -> List[dict]:
        projects = self.projects_named(project_name)
        if len(projects) != 1:
            raise ValueError(
                f"found {len(projects)} projects named {project_name}, expected 1"
            )
        return self.export_tasks(projects[0]["id"])


# ---------------------------------------------------------------------------
# Spark glue — DataFrame <-> live tool roundtrip
# ---------------------------------------------------------------------------

def upload_df(df, tool, project_name: str) -> None:
    """(line_id, text, tags) DataFrame -> live tool project, via the
    P8 format converters (kgkit.sources.formats)."""
    from kgkit.sources.formats import to_doccano, to_labelstudio

    if isinstance(tool, DoccanoHttp):
        rows = [
            {"text": r["text"],
             "label": [[t["start"], t["end"], t["label"]] for t in r["label"]]}
            for r in to_doccano(df).collect()
        ]
    else:
        rows = [
            json.loads(r)
            for r in to_labelstudio(df).toJSON().collect()
        ]
        for r in rows:
            r.pop("line_id", None)
    tool.upload(project_name, rows)


def download_df(spark, tool, project_name: str):
    """Live tool project -> (text, tags) DataFrame via the converters."""
    from kgkit.sources.formats import from_doccano, from_labelstudio

    rows = tool.download(project_name)
    if isinstance(tool, DoccanoHttp):
        doc = spark.createDataFrame(
            [(r["text"],
              [(int(t[0]), int(t[1]), str(t[2])) for t in r["label"]])
             for r in rows],
            "text string, label array<struct<start:int,end:int,label:string>>",
        )
        return from_doccano(doc)
    def _task_tuple(r):
        anns = [
            ([(res["id"], res["from_name"], res["to_name"], res["type"],
               (int(res["value"]["start"]), int(res["value"]["end"]),
                res["value"]["text"], list(res["value"]["labels"])))
              for res in ann.get("result", [])],)
            for ann in r.get("annotations", [])
        ]
        return ((r["data"]["text"],), anns)

    schema = (
        "data struct<text:string>, annotations array<struct<result:"
        "array<struct<id:string,from_name:string,to_name:string,type:string,"
        "value:struct<start:int,end:int,text:string,labels:array<string>>>>>>"
    )
    ls = spark.createDataFrame([_task_tuple(r) for r in rows], schema)
    return from_labelstudio(ls)
