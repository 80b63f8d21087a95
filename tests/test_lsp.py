"""``icicle-spark lsp`` — the reference's last CLI subcommand
(icicle-compiler/main/icicle.hs:71-75), served over stdio JSON-RPC.

In-process: ``lsp.validate`` on query documents (the t20 lexer
goldens, the same checker ladder as the REPL error path) and on
dictionary documents (SourceError -> error, skipped declaration ->
warning). Subprocess golden: a full initialize / didOpen /
publishDiagnostics / didChange / shutdown / exit conversation
against ``python -m icicle_spark lsp``."""

from __future__ import annotations

import json
import os
import subprocess
import sys

from icicle_spark.lsp import validate

DICT_GOOD = """input salary : Int

feature mean_salary =
  from salary
    in mean value
"""


def test_validate_t20_unknown_variable():
    d = validate("from salary ~> 5ea1", fields=["value", "time"])
    assert len(d) == 1
    assert d[0]["severity"] == 1
    assert d[0]["code"] == "Check error"
    # loc 1:17 (1-based) -> LSP 0-based, token-length range
    assert d[0]["range"]["start"] == {"line": 0, "character": 16}
    assert d[0]["range"]["end"]["character"] == 19
    assert "Unknown variable ea1 at 1:17" in d[0]["message"]
    assert "Suggested bindings are:" in d[0]["message"]


def test_validate_t20_unterminated_string():
    d = validate(
        'from salary ~> mean "unterminated', fields=["value", "time"]
    )
    assert d and d[0]["code"] == "Parse error"
    assert "unexpected end of input" in d[0]["message"]


def test_validate_query_doc_clean_and_line_offsets():
    text = (
        "from salary ~> count value\n"
        "\n"
        "from salary ~> 5ea1\n"
    )
    d = validate(text, fields=["value", "time"])
    assert len(d) == 1
    assert d[0]["range"]["start"]["line"] == 2  # third line


def test_validate_dictionary_doc():
    assert validate(DICT_GOOD) == []
    bad = DICT_GOOD + (
        "\nfeature broken =\n  from salary\n    in frobnicate value\n"
    )
    d = validate(bad)
    assert len(d) == 1
    assert d[0]["severity"] == 2  # warning
    assert d[0]["code"] == "skipped"
    assert "SKIPPED broken" in d[0]["message"]
    # range anchors on the declaration name
    assert d[0]["range"]["start"]["line"] == 6


class _Lsp:
    def __init__(self, proc: subprocess.Popen):
        self.proc = proc
        self._id = 0

    def send(self, method: str, params=None, request: bool = False):
        msg = {"jsonrpc": "2.0", "method": method,
               "params": params or {}}
        if request:
            self._id += 1
            msg["id"] = self._id
        body = json.dumps(msg).encode()
        self.proc.stdin.write(
            b"Content-Length: %d\r\n\r\n" % len(body) + body
        )
        self.proc.stdin.flush()
        return self._id if request else None

    def recv(self) -> dict:
        length = None
        while True:
            line = self.proc.stdout.readline()
            assert line, "server closed stdout early"
            if not line.strip():
                break
            k, _, v = line.partition(b":")
            if k.lower() == b"content-length":
                length = int(v)
        return json.loads(self.proc.stdout.read(length))


def test_lsp_subprocess_golden():
    proc = subprocess.Popen(
        [sys.executable, "-m", "icicle_spark", "lsp"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    try:
        c = _Lsp(proc)
        rid = c.send("initialize", {
            "processId": None,
            "rootUri": None,
            "capabilities": {},
            "initializationOptions": {"fields": ["value", "time"]},
        }, request=True)
        init = c.recv()
        assert init["id"] == rid
        assert init["result"]["capabilities"]["textDocumentSync"] == 1
        assert init["result"]["serverInfo"]["name"] == "icicle-spark-lsp"
        c.send("initialized", {})
        uri = "file:///q.icicle"
        c.send("textDocument/didOpen", {"textDocument": {
            "uri": uri, "languageId": "icicle", "version": 1,
            "text": "from salary ~> 5ea1",
        }})
        pub = c.recv()
        assert pub["method"] == "textDocument/publishDiagnostics"
        assert pub["params"]["uri"] == uri
        (diag,) = pub["params"]["diagnostics"]
        assert "Unknown variable ea1 at 1:17" in diag["message"]
        assert diag["range"]["start"] == {"line": 0, "character": 16}
        # fix the document: diagnostics clear
        c.send("textDocument/didChange", {
            "textDocument": {"uri": uri, "version": 2},
            "contentChanges": [
                {"text": "from salary ~> count value"}
            ],
        })
        pub2 = c.recv()
        assert pub2["params"]["diagnostics"] == []
        c.send("shutdown", request=True)
        assert c.recv()["result"] is None
        c.send("exit")
        assert proc.wait(timeout=30) == 0
    finally:
        if proc.poll() is None:
            proc.kill()


def test_lsp_survives_malformed_messages():
    proc = subprocess.Popen(
        [sys.executable, "-m", "icicle_spark", "lsp"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    try:
        c = _Lsp(proc)
        c.send("initialize", {"capabilities": {}}, request=True)
        assert c.recv()["result"]["serverInfo"]["name"] \
            == "icicle-spark-lsp"
        # malformed notification: missing textDocument -> KeyError
        # must NOT kill the server (logged to stderr instead)
        c.send("textDocument/didOpen", {"bogus": 1})
        # unknown REQUEST: answered with method-not-found
        rid = c.send("textDocument/didOpen2", {}, request=True)
        err = c.recv()
        assert err["id"] == rid and err["error"]["code"] == -32601
        # known-method REQUEST with malformed params (KeyError in the
        # handler): answered with the JSON-RPC internal error, not a
        # dead server
        rid = c.send("textDocument/didOpen", {"bogus": 1},
                     request=True)
        err = c.recv()
        assert err["id"] == rid and err["error"]["code"] == -32603
        assert "KeyError" in err["error"]["message"]
        # server still fully functional afterwards
        c.send("textDocument/didOpen", {"textDocument": {
            "uri": "file:///ok.icicle", "text": "from t ~> count x",
        }})
        pub = c.recv()
        assert pub["method"] == "textDocument/publishDiagnostics"
        c.send("shutdown", request=True)
        assert c.recv()["result"] is None
        c.send("exit")
        assert proc.wait(timeout=30) == 0
    finally:
        if proc.poll() is None:
            proc.kill()


def test_lsp_answers_parse_error_and_keeps_serving():
    proc = subprocess.Popen(
        [sys.executable, "-m", "icicle_spark", "lsp"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    try:
        c = _Lsp(proc)
        c.send("initialize", {"capabilities": {}}, request=True)
        c.recv()
        # well-FRAMED but invalid JSON: exactly Content-Length bytes
        # consumed, so the server answers -32700 and stays alive
        body = b"{oops"
        proc.stdin.write(
            b"Content-Length: %d\r\n\r\n" % len(body) + body
        )
        proc.stdin.flush()
        err = c.recv()
        assert err["error"]["code"] == -32700 and err["id"] is None
        # didClose clears diagnostics for the closed document
        uri = "file:///q.icicle"
        c.send("textDocument/didOpen", {"textDocument": {
            "uri": uri, "text": "from salary ~> 5ea1",
        }})
        assert len(c.recv()["params"]["diagnostics"]) == 1
        c.send("textDocument/didClose", {"textDocument": {"uri": uri}})
        pub = c.recv()
        assert pub["params"] == {"uri": uri, "diagnostics": []}
        c.send("shutdown", request=True)
        assert c.recv()["result"] is None
        c.send("exit")
        assert proc.wait(timeout=30) == 0
    finally:
        if proc.poll() is None:
            proc.kill()
