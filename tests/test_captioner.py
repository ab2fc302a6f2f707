"""API captioner tests against a mocked OpenAI-compatible HTTP endpoint.

Covers the reference captioning loop's behavior (prompt_generator.py:31-96):
refusal resampling, model escalation after 2 refusals, transient-error
retry, and the output file format consumed by read_caption_prompts.
"""

import http.server
import json
import os
import random
import threading

import pytest

from tpu_reid.tools.caption_prompts import (
    CAPTION_INSTRUCTION,
    caption_identity,
    collect_identity_images,
)


class _ScriptedHandler(http.server.BaseHTTPRequestHandler):
    """Replies from a per-server script of canned JSON responses."""

    script = []  # list of dicts; last one repeats
    seen = []  # parsed request payloads

    def do_POST(self):
        body = self.rfile.read(int(self.headers["Content-Length"]))
        payload = json.loads(body)
        type(self).seen.append(payload)
        idx = min(len(type(self).seen) - 1, len(type(self).script) - 1)
        data = json.dumps(type(self).script[idx]).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture
def scripted_server():
    servers = []

    def make(script):
        handler = type(
            "H", (_ScriptedHandler,), {"script": script, "seen": []}
        )
        srv = http.server.HTTPServer(("127.0.0.1", 0), handler)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        servers.append(srv)
        return f"http://127.0.0.1:{srv.server_address[1]}/v1/chat/completions", handler

    yield make
    for srv in servers:
        srv.shutdown()
        srv.server_close()


def _ok(text):
    return {"choices": [{"message": {"content": text}}]}


@pytest.fixture
def crops(tmp_path):
    paths = []
    for i in range(4):
        p = tmp_path / f"0001_c1s1_{i:06d}_00.jpg"
        p.write_bytes(b"\xff\xd8fakejpeg" + bytes([i]))
        paths.append(str(p))
    return paths


def test_caption_success_first_try(scripted_server, crops):
    url, handler = scripted_server([_ok("A photo of a person in red.")])
    out = caption_identity(crops, url, "k", rng=random.Random(0),
                           retry_sleep=0.0)
    assert out == "A photo of a person in red."
    req = handler.seen[0]
    parts = req["messages"][0]["content"]
    assert parts[0] == {"type": "text", "text": CAPTION_INSTRUCTION}
    # two distinct image crops attached (reference sends 2 per identity)
    assert [p["type"] for p in parts[1:]] == ["image_url", "image_url"]
    assert parts[1] != parts[2]
    assert req["model"] == "gpt-4o-mini"
    assert req["max_tokens"] == 256


def test_caption_refusal_escalates_model(scripted_server, crops):
    url, handler = scripted_server([
        _ok("I'm sorry, I can't identify people."),
        _ok("I am unable to help with that."),
        _ok("A photo of a person in a blue jacket."),
    ])
    out = caption_identity(crops, url, "k", rng=random.Random(0),
                           retry_sleep=0.0)
    assert out == "A photo of a person in a blue jacket."
    models = [r["model"] for r in handler.seen]
    # two refusals on the small model, then escalation (reference: level>=2)
    assert models == ["gpt-4o-mini", "gpt-4o-mini", "gpt-4o"]


def test_caption_transient_error_retries(scripted_server, crops):
    url, handler = scripted_server([
        {"error": {"message": "rate limited"}},
        _ok("A photo of a person with a backpack."),
    ])
    out = caption_identity(crops, url, "k", rng=random.Random(0),
                           retry_sleep=0.0)
    assert out == "A photo of a person with a backpack."
    assert len(handler.seen) == 2


def test_caption_gives_up_after_max_attempts(scripted_server, crops):
    url, _ = scripted_server([_ok("sorry, no.")])
    with pytest.raises(RuntimeError, match="no usable answer"):
        caption_identity(crops, url, "k", rng=random.Random(0),
                         max_attempts=3, retry_sleep=0.0)


def test_collect_identity_images(tmp_path):
    for name in ("0001_c1_000.jpg", "0001_c2_001.jpg", "0007_c1_000.jpg",
                 "-1_c1_000.jpg", "Thumbs.db"):
        (tmp_path / name).write_bytes(b"x")
    by_label = collect_identity_images(str(tmp_path))
    assert sorted(by_label) == [1, 7]
    assert len(by_label[1]) == 2


def test_main_api_mode_writes_prompt_file(scripted_server, tmp_path,
                                          monkeypatch, capsys):
    imgs = tmp_path / "train"
    imgs.mkdir()
    for label in (3, 9):
        for i in range(2):
            (imgs / f"{label:04d}_c1s1_{i:06d}_00.jpg").write_bytes(b"j")
    url, _ = scripted_server([_ok("A photo of a person in green.")])
    out = tmp_path / "prompts.txt"
    monkeypatch.setattr(
        "sys.argv",
        ["caption_prompts", "--n_cls", "2", "--out", str(out),
         "--images_root", str(imgs), "--api_url", url,
         "--api_key", "k", "--retry_sleep", "0"],
    )
    from tpu_reid.tools.caption_prompts import main

    main()
    lines = out.read_text().strip().split("\n")
    assert lines == ["0: A photo of a person in green.",
                     "1: A photo of a person in green."]
    # the file parses through the real consumer
    from tpu_reid.models.prompts import read_caption_prompts

    caps = read_caption_prompts(str(out), n_cls=2)
    assert caps[0].startswith("A photo of")
