"""SECRET[backend.key] config interpolation (src/secrets/) — the
reference's tests/behavior/config/secret.yaml scenario ported: test, file,
directory (with nested paths + whitespace trim), and exec backends, all
feeding a remap transform through the normal loader path."""

from __future__ import annotations

import json
import stat
import sys

import pytest

from vector_spark.config.secrets import SecretError, resolve_secrets


def _backends(tmp_path):
    (tmp_path / "file-secrets.json").write_text(
        json.dumps({"ghi": "ghi.retrieved"})
    )
    d = tmp_path / "dir-secrets"
    (d / "nested").mkdir(parents=True)
    (d / "jkl").write_text("jkl.retrieved\n")
    (d / "nested" / "username").write_text("Gandalf\n")
    (d / "nested" / "password").write_text("YouShallNotPass")
    backend = tmp_path / "exec-backend.py"
    backend.write_text(
        "#!/usr/bin/env python3\n"
        "import json, sys\n"
        "q = json.load(sys.stdin)\n"
        "assert q['version'] == '1.0'\n"
        "print(json.dumps({k: {'value': k + '.retrieved', 'error': None}\n"
        "                  for k in q['secrets']}))\n"
    )
    backend.chmod(backend.stat().st_mode | stat.S_IEXEC)
    return {
        "test_backend": {"type": "test", "replacement": "this_is_a_secret_value"},
        "exec_backend": {"type": "exec", "command": [sys.executable, str(backend)]},
        "file_backend": {"type": "file", "path": str(tmp_path / "file-secrets.json")},
        "directory_backend": {
            "type": "directory",
            "path": str(d),
            "remove_trailing_whitespace": True,
        },
    }


def test_reference_secret_yaml_scenario(spark, tmp_path):
    from vector_spark.config.loader import build_topology

    cfg = {
        "secret": _backends(tmp_path),
        "sources": {"ev": {"type": "values", "rows": [{"message": ""}]}},
        "transforms": {
            "add_field_from_secret": {
                "type": "remap",
                "inputs": ["ev"],
                "source": (
                    '.foobar = "SECRET[test_backend.abc]"\n'
                    '.foobarbaz = "SECRET[exec_backend.def]"\n'
                    '.foobarbazqux = "SECRET[file_backend.ghi]"\n'
                    '.foobarbazquxquux = "SECRET[directory_backend.jkl]"\n'
                    '.nested_path_username = "SECRET[directory_backend.nested/username]"\n'
                    '.nested_path_password = "SECRET[directory_backend.nested/password]"\n'
                ),
            }
        },
    }
    topo = build_topology(spark, resolve_secrets(cfg))
    row = topo.output("add_field_from_secret").head().asDict()
    assert row["foobar"] == "this_is_a_secret_value"
    assert row["foobarbaz"] == "def.retrieved"
    assert row["foobarbazqux"] == "ghi.retrieved"
    assert row["foobarbazquxquux"] == "jkl.retrieved"
    assert row["nested_path_username"] == "Gandalf"
    assert row["nested_path_password"] == "YouShallNotPass"


def test_loader_resolves_secrets_from_file(spark, tmp_path):
    from vector_spark.config.loader import load_topology

    p = tmp_path / "topo.yaml"
    p.write_text(
        """
secret:
  t: {type: test, replacement: sekrit}
sources:
  ev: {type: values, rows: [{message: hi}]}
transforms:
  tag:
    type: remap
    inputs: [ev]
    assign: {token: "'SECRET[t.any]'"}
"""
    )
    topo = load_topology(spark, str(p))
    assert topo.output("tag").head()["token"] == "sekrit"


def test_secret_errors(tmp_path):
    with pytest.raises(SecretError, match="unknown secret backend 'nope'"):
        resolve_secrets(
            {"secret": {}, "sinks": {"s": {"url": "SECRET[nope.k]"}}}
        )
    (tmp_path / "empty.json").write_text("{}")
    with pytest.raises(SecretError, match="missing secret keys"):
        resolve_secrets(
            {
                "secret": {
                    "f": {"type": "file", "path": str(tmp_path / "empty.json")}
                },
                "sinks": {"s": {"url": "SECRET[f.k]"}},
            }
        )
    # directory traversal is rejected
    d = tmp_path / "dir"
    d.mkdir()
    with pytest.raises(SecretError, match="escapes the directory"):
        resolve_secrets(
            {
                "secret": {"d": {"type": "directory", "path": str(d)}},
                "sinks": {"s": {"url": "SECRET[d.../outside]"}},
            }
        )


def test_secret_section_stripped_and_noop_without_refs():
    cfg = {"secret": {"t": {"type": "test", "replacement": "x"}},
           "sources": {"ev": {"type": "values", "rows": []}}}
    out = resolve_secrets(cfg)
    assert "secret" not in out
    plain = {"sources": {"ev": {"type": "values", "rows": []}}}
    assert resolve_secrets(plain) is plain


def test_directory_backend_rejects_sibling_prefix_escape(tmp_path):
    # Review finding r3 (low): the escape check was a raw string-prefix
    # test, so base '/x/sec' admitted '../secrets2/k' (resolves to
    # '/x/secrets2/k', which shares the '/x/sec' prefix). commonpath
    # closes the sibling-directory hole.
    base = tmp_path / "sec"
    base.mkdir()
    sib = tmp_path / "secrets2"
    sib.mkdir()
    (sib / "k").write_text("leaked")
    with pytest.raises(SecretError, match="escapes the directory"):
        resolve_secrets(
            {
                "secret": {"d": {"type": "directory", "path": str(base)}},
                "sinks": {"s": {"url": "SECRET[d.../secrets2/k]"}},
            }
        )


def test_directory_backend_mixed_abs_rel_raises_secret_error(tmp_path, monkeypatch):
    # ADVICE r4 (low): with a RELATIVE base path and a key resolving to an
    # absolute path, os.path.commonpath raises ValueError — the escape must
    # still surface as SecretError, not an unhandled crash.
    base = tmp_path / "sec"
    base.mkdir()
    monkeypatch.chdir(tmp_path)
    with pytest.raises(SecretError, match="escapes the directory"):
        resolve_secrets(
            {
                "secret": {"d": {"type": "directory", "path": "sec"}},
                "sinks": {"s": {"url": "SECRET[d./etc/passwd]"}},
            }
        )


# ------------------------------------------------- aws_secrets_manager


@pytest.fixture()
def fake_secretsmanager():
    """A SecretsManager-shaped endpoint: answers GetSecretValue with a
    JSON SecretString, records the request for SigV4/Target checks."""
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    seen: list[dict] = []

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            req = _json.loads(self.rfile.read(n))
            seen.append({"headers": dict(self.headers), "body": req})
            body = _json.dumps({
                "ARN": "arn:aws:secretsmanager:us-east-1:1:secret:x",
                "Name": req.get("SecretId"),
                "SecretString": _json.dumps(
                    {"api_key": "k-123", "token": "t-9", "empty": ""}),
            }).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/x-amz-json-1.1")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_port}", seen
    srv.shutdown()


def _asm_cfg(endpoint, key):
    return {
        "secret": {"aws": {
            "type": "aws_secrets_manager",
            "secret_id": "prod/creds",
            "endpoint": endpoint,
            "region": "us-east-1",
            "access_key": "AKIATEST",
            "secret_key": "sk-test",
        }},
        "sinks": {"s": {"header": f"SECRET[aws.{key}]"}},
    }


def test_aws_secrets_manager_resolves(fake_secretsmanager):
    endpoint, seen = fake_secretsmanager
    cfg = resolve_secrets(_asm_cfg(endpoint, "api_key"))
    assert cfg["sinks"]["s"]["header"] == "k-123"
    assert "secret" not in cfg
    req = seen[0]
    assert req["body"] == {"SecretId": "prod/creds"}
    assert req["headers"]["X-Amz-Target"] == "secretsmanager.GetSecretValue"
    auth = req["headers"]["Authorization"]
    assert auth.startswith("AWS4-HMAC-SHA256") and "secretsmanager" in auth


def test_aws_secrets_manager_missing_key_errors(fake_secretsmanager):
    endpoint, _ = fake_secretsmanager
    with pytest.raises(SecretError, match="does not exist"):
        resolve_secrets(_asm_cfg(endpoint, "nope"))


def test_aws_secrets_manager_empty_value_errors(fake_secretsmanager):
    endpoint, _ = fake_secretsmanager
    with pytest.raises(SecretError, match="was empty"):
        resolve_secrets(_asm_cfg(endpoint, "empty"))


def test_aws_secrets_manager_unreachable_errors():
    with pytest.raises(SecretError, match="GetSecretValue failed"):
        resolve_secrets(_asm_cfg("http://127.0.0.1:1", "api_key"))


def test_exec_backend_v1_1_curries_type_and_config(tmp_path):
    """exec protocol v1.1 (exec.rs ExecVersion::V1_1): the request
    carries the backend type and config so a generic executable can
    dispatch."""
    import json as _json

    from vector_spark.config.secrets import resolve_secrets

    script = tmp_path / "backend.py"
    script.write_text(
        "import json, sys\n"
        "q = json.load(sys.stdin)\n"
        "assert q['version'] == '1.1', q\n"
        "assert q['type'] == 'vault', q\n"
        "assert q['config'] == {'address': 'http://v:8200'}, q\n"
        "print(json.dumps({k: {'value': f'{k}-val', 'error': None}\n"
        "                  for k in q['secrets']}))\n"
    )
    cfg = {
        "secret": {
            "b": {
                "type": "exec",
                "command": ["python3", str(script)],
                "protocol": {
                    "version": "v1_1",
                    "backend_type": "vault",
                    "backend_config": {"address": "http://v:8200"},
                },
            }
        },
        "sources": {
            "s": {"type": "values", "rows": [],
                  "token": "SECRET[b.api_key]"}
        },
    }
    out = resolve_secrets(cfg)
    assert out["sources"]["s"]["token"] == "api_key-val"
