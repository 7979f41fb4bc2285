"""S8 — REST source/sink: the reference's serving surface (server.py) on
the engine's own kernel, framework-free.

The reference serves its NER behind Flask: ``GET /ready`` → ``'OK'`` and
``POST /recognize`` accepting ``str | list[str] | list[dict with "text"]``
(homogeneous lists only — server.py:74-122), answering a single string with
``{"text": ..., "ners": [...]}`` and a list by ENRICHING each input sample
with a ``ners`` key (server.py:185-204), where each ner is
``(char_start, char_end_exclusive, TYPE)`` (server.py:170-177: bounds come
from the half-open subtoken bounds). Errors return HTTP 400 with
``{"message": ...}``.

This module re-expresses that contract on the stdlib ``http.server`` (no
Flask dependency) over any engine ``Scorer`` via the same
``detect_mentions_in_text`` kernel the Spark ``extract_mentions`` operator
runs — serving and analytics share one code path, so a span returned by the
endpoint is byte-identical to the span the distributed pipeline lands in
the mentions table. Serving is driver-side by design (one process, small
payloads); bulk scoring belongs to ``extract_mentions`` on the cluster.

Deliberate divergences from the reference (parity-audit notes):

1. When a dict sample's ``text`` value is not a str, the reference sets
   ``err_msg = ''`` and breaks (server.py:96-99), so the caller typically
   sees the misleading "The input data are empty!" message. This module
   raises a descriptive 400 instead ("Data type of sample N[\"text\"] of
   input data is unexpected! ...") — same status code, honest message.
2. The reference's "Data type of sample N of input data is uknown!"
   message (server.py:107) carries a typo; this module spells "unknown".
Both are intentional fixes, not drift — a byte-level parity audit of the
400 bodies will differ on exactly these two branches.
"""

from __future__ import annotations

import copy
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Union


def check_input_data(data: list[Union[str, dict]]) -> str:
    """Validate list-input homogeneity; → 'str' or 'dict'. Mirrors the
    reference's polymorphism contract (server.py:74-122): every element a
    str, or every element a dict carrying a str ``text``."""
    res = ""
    err_msg = ""
    for idx, cur in enumerate(data):
        if isinstance(cur, str):
            if not res:
                res = "str"
            elif res != "str":
                err_msg = (
                    f"Data type of sample {idx} of input data is unexpected!"
                    f" Expected {res}, got {type(cur)}."
                )
                break
        elif isinstance(cur, dict):
            if "text" not in cur:
                err_msg = (
                    f"Sample {idx} describes unknown data! The `text` is not"
                    f" found in the key list {sorted(cur.keys())}."
                )
                break
            if not isinstance(cur["text"], str):
                err_msg = (
                    f'Data type of sample {idx}["text"] of input data is'
                    f' unexpected! Expected str, got {cur["text"]}.'
                )
                break
            if not res:
                res = "dict"
            elif res != "dict":
                err_msg = (
                    f"Data type of sample {idx} of input data is unexpected!"
                    f" Expected {res}, got {type(cur)}."
                )
                break
        else:
            err_msg = (
                f"Data type of sample {idx} of input data is wrong!"
                f" Expected str or dict, got {type(cur)}."
            )
            break
    if err_msg:
        raise ValueError(err_msg)
    if not res:
        raise ValueError("The input data are empty!")
    return res


def extract_texts(data: list[Union[str, dict]]) -> list[str]:
    if check_input_data(data) == "str":
        return list(data)
    return [cur["text"] for cur in data]


def enrich_data_with_recognition_results(
    data: list[Union[str, dict]],
    recognition_results: list[list[tuple[int, int, str]]],
) -> list[dict]:
    """str inputs become {'text', 'ners'}; dict inputs are deep-copied and
    gain a 'ners' key (server.py:185-204)."""
    data_type = check_input_data(data)
    if len(data) != len(recognition_results):
        raise ValueError(
            f"Source data do not correspond to recognition results!"
            f" {len(data)} != {len(recognition_results)}"
        )
    out: list[dict] = []
    if data_type == "str":
        for text, res in zip(data, recognition_results):
            out.append({"text": text, "ners": res})
    else:
        for sample, res in zip(data, recognition_results):
            enriched = copy.deepcopy(sample)
            enriched["ners"] = res
            out.append(enriched)
    return out


def recognize_single_text(
    text: str, scorer, wp=None
) -> list[tuple[int, int, str]]:
    """One text → [(start, end_exclusive, TYPE)] — the endpoint's span
    order, produced by the SAME kernel extract_mentions distributes."""
    from runne_contrastive_ner_spark.operators.mentions import (
        detect_mentions_in_text,
    )

    return [
        (start, end, etype)
        for etype, start, end in detect_mentions_in_text(text, scorer, wp=wp)
    ]


def _make_handler(scorer, wp):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet test runs
            pass

        def _reply(self, code: int, payload, raw: bool = False) -> None:
            body = payload.encode() if raw else json.dumps(payload).encode()
            self.send_response(code)
            self.send_header(
                "Content-Type", "text/plain" if raw else "application/json"
            )
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/ready":
                self._reply(200, "OK", raw=True)
            else:
                self._reply(404, {"message": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/recognize":
                self._reply(404, {"message": f"unknown path {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                request_data = json.loads(self.rfile.read(n))
            except (ValueError, json.JSONDecodeError) as exc:
                self._reply(400, {"message": f"invalid JSON body: {exc}"})
                return
            if not isinstance(request_data, (str, list)):
                self._reply(
                    400,
                    {
                        "message": f"{type(request_data)} is unknown data type"
                        " for the named entity recognizer!"
                    },
                )
                return
            try:
                if isinstance(request_data, str):
                    ners = recognize_single_text(request_data, scorer, wp)
                    self._reply(200, {"text": request_data, "ners": ners})
                else:
                    if not request_data:
                        raise ValueError("The input data are empty!")
                    texts = extract_texts(request_data)
                    results = [
                        recognize_single_text(t, scorer, wp) for t in texts
                    ]
                    self._reply(
                        200,
                        enrich_data_with_recognition_results(
                            request_data, results
                        ),
                    )
            except ValueError as exc:
                self._reply(400, {"message": str(exc)})

    return Handler


def build_server(
    scorer, wp=None, host: str = "127.0.0.1", port: int = 0
) -> ThreadingHTTPServer:
    """→ a ready-to-serve ThreadingHTTPServer (port 0 = ephemeral; the bound
    port is ``server.server_address[1]``). Caller runs ``serve_forever()``
    (typically on a daemon thread) and ``shutdown()``."""
    return ThreadingHTTPServer((host, port), _make_handler(scorer, wp))


def main() -> None:  # pragma: no cover - thin CLI
    """``python -m runne_contrastive_ner_spark.sources.rest MODEL_DIR
    [PORT]`` — serve a TransformerScorer artifact (ner.json + ner.npz),
    the deployment twin of the reference's ``python server.py``."""
    import sys

    from runne_contrastive_ner_spark.functions.scorer import TransformerScorer
    from runne_contrastive_ner_spark.functions.wordpiece import load_wordpiece

    model_dir = sys.argv[1]
    port = int(sys.argv[2]) if len(sys.argv) > 2 else 8010
    scorer = TransformerScorer(model_dir)
    wp = load_wordpiece(scorer.artifact["bert_path"])
    srv = build_server(scorer, wp=wp, host="0.0.0.0", port=port)
    print(f"serving on {srv.server_address}")
    srv.serve_forever()


if __name__ == "__main__":  # pragma: no cover
    main()
