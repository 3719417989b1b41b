"""Env-gated OpenAI-compatible LLM backend (VERDICT r1 next-round #10).

Spins up an in-process HTTP server speaking the chat-completions protocol so
the real network client is exercised end-to-end without egress — the
analogue of the reference's mock-LLM pattern (reference
partially_positive_examples_selection.py:23-26)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from qst_tpu.augment.llm_client import (
    BASE_URL_ENV,
    OpenAICompatibleClient,
    get_llm_fn,
)
from qst_tpu.augment.partial_positive import LLM, get_part_pos_examples


class _Handler(BaseHTTPRequestHandler):
    requests: list = []
    fail_first = 0

    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        type(self).requests.append(
            {"path": self.path, "body": body,
             "auth": self.headers.get("Authorization")})
        if type(self).fail_first > 0:
            type(self).fail_first -= 1
            self.send_response(500)
            self.end_headers()
            return
        prompt = body["messages"][0]["content"]
        content = ("1. a partial one\n2. a partial two\n3. a partial three\n"
                   "4. a partial four\n5. a partial five")
        resp = json.dumps({
            "choices": [{"message": {"role": "assistant",
                                     "content": content}}],
            "model": body["model"],
        }).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(resp)))
        self.end_headers()
        self.wfile.write(resp)

    def log_message(self, *a):  # silence test output
        pass


@pytest.fixture
def llm_server():
    _Handler.requests = []
    _Handler.fail_first = 0
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}/v1"
    srv.shutdown()


def test_client_roundtrip(llm_server):
    client = OpenAICompatibleClient(llm_server, api_key="sk-test",
                                    model="test-model")
    out = client("give me partials")
    assert "partial one" in out
    (req,) = _Handler.requests
    assert req["path"] == "/v1/chat/completions"
    assert req["auth"] == "Bearer sk-test"
    assert req["body"]["model"] == "test-model"
    assert req["body"]["messages"][0]["content"] == "give me partials"


def test_client_retries_then_succeeds(llm_server):
    _Handler.fail_first = 1
    client = OpenAICompatibleClient(llm_server, max_retries=3)
    assert "partial two" in client("p")
    assert len(_Handler.requests) == 2


def test_client_exhausts_retries(llm_server):
    _Handler.fail_first = 99
    client = OpenAICompatibleClient(llm_server, max_retries=2)
    with pytest.raises(RuntimeError, match="failed after 2"):
        client("p")


def test_env_gate(monkeypatch, llm_server):
    monkeypatch.delenv(BASE_URL_ENV, raising=False)
    assert get_llm_fn() is None  # closed gate -> mock stays default
    monkeypatch.setenv(BASE_URL_ENV, llm_server)
    fn = get_llm_fn()
    assert fn is not None and "partial three" in fn("x")


def test_part_pos_llm_strategy_uses_env_client(monkeypatch, llm_server):
    monkeypatch.setenv(BASE_URL_ENV, llm_server)
    out = get_part_pos_examples("a cat sits on the mat",
                                n_part_pos_examples=5, algorithm_type=LLM)
    assert len(out) == 5
    assert out[0] == "a partial one"
    assert _Handler.requests  # the HTTP backend was actually hit


def test_part_pos_llm_strategy_mock_fallback(monkeypatch):
    monkeypatch.delenv(BASE_URL_ENV, raising=False)
    out = get_part_pos_examples("a cat sits on the mat",
                                n_part_pos_examples=5, algorithm_type=LLM)
    assert len(out) >= 1  # canned mock response parsed
