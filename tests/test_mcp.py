"""MCP tool import over a real (in-process) streamable-HTTP server —
reference func/mcp.py:14-42 mcp_udfs. The client speaks JSON-RPC 2.0 with
session handshake; the test server implements initialize / tools/list /
tools/call for two tools."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from pixeltable_spark.functions import invoke_tools, mcp_udfs

TOOLS = [
    {"name": "add", "description": "Add two integers",
     "inputSchema": {"type": "object",
                     "properties": {"a": {"type": "integer"},
                                    "b": {"type": "integer"}},
                     "required": ["a", "b"]}},
    {"name": "greet", "description": "Greet a person",
     "inputSchema": {"type": "object",
                     "properties": {"who": {"type": "string"}},
                     "required": ["who"]}},
]


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # quiet
        pass

    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        method = body.get("method")
        rid = body.get("id")
        if rid is None:  # notification
            self.send_response(202)
            self.end_headers()
            return
        if method == "initialize":
            result = {"protocolVersion": "2025-03-26", "capabilities": {},
                      "serverInfo": {"name": "test-mcp", "version": "1"}}
            extra = {"Mcp-Session-Id": "sess-123"}
        elif method == "tools/list":
            assert self.headers.get("Mcp-Session-Id") == "sess-123"
            result = {"tools": TOOLS}
            extra = {}
        elif method == "tools/call":
            params = body["params"]
            if params["name"] == "add":
                val = params["arguments"]["a"] + params["arguments"]["b"]
            else:
                val = f"hello {params['arguments']['who']}"
            result = {"content": [{"type": "text", "text": json.dumps(val)}],
                      "isError": False}
            extra = {}
        else:
            result = {}
            extra = {}
        payload = json.dumps({"jsonrpc": "2.0", "id": rid, "result": result})
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        for k, v in extra.items():
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload.encode())


@pytest.fixture()
def mcp_server():
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}/mcp"
    srv.shutdown()


class TestMcpUdfs:
    def test_lists_and_invokes_tools(self, mcp_server):
        tools = mcp_udfs(mcp_server)
        assert [t.name for t in tools] == ["add", "greet"]
        assert tools[0].invoke(a=2, b=40) == 42
        assert tools[1].invoke(who="world") == "hello world"

    def test_server_schema_in_spec(self, mcp_server):
        tools = mcp_udfs(mcp_server)
        spec = tools[0].spec()
        assert spec["parameters"]["properties"]["a"]["type"] == "integer"
        assert spec["description"] == "Add two integers"

    def test_invoke_tools_roundtrip(self, mcp_server):
        tools = mcp_udfs(mcp_server)
        llm_response = {"tool_calls": [
            {"function": {"name": "add", "arguments": '{"a": 1, "b": 2}'}},
            {"function": {"name": "greet", "arguments": '{"who": "pxt"}'}},
        ]}
        out = invoke_tools(tools, llm_response)
        assert out[0]["result"] == 3
        assert out[1]["result"] == "hello pxt"


class TestSseParsing:
    """SSE framing per spec: blank-line-delimited events, multi-line data
    joined with newline, response matched by JSON-RPC id (not position)."""

    def test_multiline_data_joined(self):
        from pixeltable_spark.functions.query_template import _McpClient
        body = 'data: {"jsonrpc": "2.0",\ndata:  "id": 7, "result": {"ok": 1}}\n\n'
        msg = _McpClient._parse_sse(body, 7)
        assert msg == {"jsonrpc": "2.0", "id": 7, "result": {"ok": 1}}

    def test_interleaved_notification_skipped(self):
        from pixeltable_spark.functions.query_template import _McpClient
        body = (
            'data: {"jsonrpc": "2.0", "method": "notifications/progress", '
            '"params": {"p": 1}}\n\n'
            'data: {"jsonrpc": "2.0", "id": 3, "result": {"v": 42}}\n\n'
            'data: {"jsonrpc": "2.0", "method": "notifications/progress", '
            '"params": {"p": 2}}\n\n')
        msg = _McpClient._parse_sse(body, 3)
        assert msg["result"] == {"v": 42}

    def test_fallback_prefers_id_bearing_message(self):
        from pixeltable_spark.functions.query_template import _McpClient
        body = (
            'data: {"jsonrpc": "2.0", "method": "n/1"}\n\n'
            'data: {"jsonrpc": "2.0", "id": 99, "result": {}}\n\n')
        # no id match (want 5) -> the id-bearing message wins over the
        # notification
        msg = _McpClient._parse_sse(body, 5)
        assert msg["id"] == 99

    def test_event_fields_other_than_data_ignored(self):
        from pixeltable_spark.functions.query_template import _McpClient
        body = ('event: message\nid: e1\nretry: 100\n'
                'data: {"jsonrpc": "2.0", "id": 1, "result": {"x": 2}}\n\n')
        assert _McpClient._parse_sse(body, 1)["result"] == {"x": 2}

    def test_empty_stream(self):
        from pixeltable_spark.functions.query_template import _McpClient
        assert _McpClient._parse_sse("", 1) is None
