"""Config secrets interpolation: ``SECRET[backend.key]`` placeholders.

Reference: `src/secrets/mod.rs` — a `secret:` section declares named
backends; every string in the rest of the config may reference
``SECRET[backend.key]``, resolved at load time (after env interpolation,
before the topology builds) and the `secret:` section never reaches the
built topology. Backends mirrored here (src/secrets/{test,exec,file,
directory}.rs):

- ``test``      — returns the configured ``replacement`` for any key.
- ``exec``      — runs a command; the query ``{"version": "1.0",
  "secrets": [keys...]}`` goes to its stdin, the reply maps each key to
  ``{"value": ..., "error": ...}`` (the reference's documented backend
  protocol).
- ``file``      — JSON object file, key → secret.
- ``directory`` — one file per key (nested paths allowed);
  ``remove_trailing_whitespace`` trims.
- ``aws_secrets_manager`` — GetSecretValue over the repo's own SigV4
  signer (aws_secrets_manager.rs; SecretString = JSON key→value map,
  missing/empty keys error). ``endpoint`` overrides the regional URL,
  so localstack-style fakes validate it offline.

Unknown backends, missing keys, and per-key errors raise — a config that
references an unresolvable secret must not build, same strictness as the
reference.
"""

from __future__ import annotations

import json
import re
import subprocess

_SECRET_RE = re.compile(r"SECRET\[([A-Za-z0-9_]+)\.([^\]]+)\]")


class SecretError(ValueError):
    pass


def _collect_refs(node, refs: set[tuple[str, str]]) -> None:
    if isinstance(node, str):
        for m in _SECRET_RE.finditer(node):
            refs.add((m.group(1), m.group(2)))
    elif isinstance(node, dict):
        for v in node.values():
            _collect_refs(v, refs)
    elif isinstance(node, (list, tuple)):
        for v in node:
            _collect_refs(v, refs)


def _resolve_backend(name: str, bcfg: dict, keys: list[str]) -> dict[str, str]:
    btype = bcfg.get("type")
    if btype == "test":
        return {k: bcfg["replacement"] for k in keys}
    if btype == "file":
        with open(bcfg["path"]) as f:
            data = json.load(f)
        missing = [k for k in keys if k not in data]
        if missing:
            raise SecretError(f"{name}: missing secret keys {missing}")
        return {k: data[k] for k in keys}
    if btype == "directory":
        import os

        out = {}
        base = bcfg["path"]
        for k in keys:
            # abspath both sides first: commonpath raises ValueError on
            # mixed absolute/relative inputs (e.g. relative base + a key
            # like '/etc/passwd'), and the escape must surface as a
            # SecretError, not a crash. commonpath, not a string prefix:
            # base '/sec' must not admit '/secrets2/x'.
            nb = os.path.abspath(os.path.normpath(base))
            p = os.path.abspath(os.path.normpath(os.path.join(base, k)))
            try:
                escapes = os.path.commonpath([nb, p]) != nb
            except ValueError:
                escapes = True
            if escapes:
                raise SecretError(f"{name}: key {k!r} escapes the directory")
            try:
                with open(p) as f:
                    v = f.read()
            except OSError as e:
                raise SecretError(f"{name}: cannot read key {k!r}: {e}")
            if bcfg.get("remove_trailing_whitespace"):
                v = v.rstrip()
            out[k] = v
        return out
    if btype == "exec":
        # protocol v1.1 (src/secrets/exec.rs ExecVersion::V1_1): the
        # backend's own type + config CURRY into each request, so one
        # generic executable can serve many backend kinds
        proto = bcfg.get("protocol") or {}
        pver = str(proto.get("version", "v1")).lower().replace("_", ".")
        q: dict = {"version": "1.0", "secrets": sorted(keys)}
        if pver in ("v1.1", "1.1"):
            q["version"] = "1.1"
            q["type"] = proto.get("backend_type", "")
            q["config"] = proto.get("backend_config", {})
        query = json.dumps(q)
        proc = subprocess.run(
            bcfg["command"],
            input=query.encode(),
            capture_output=True,
            timeout=float(bcfg.get("timeout", 5)),
        )
        if proc.returncode != 0:
            raise SecretError(
                f"{name}: backend command failed: {proc.stderr.decode()[:200]}"
            )
        reply = json.loads(proc.stdout.decode())
        out = {}
        for k in keys:
            ent = reply.get(k)
            if not ent or ent.get("error") or ent.get("value") is None:
                raise SecretError(
                    f"{name}: backend returned no value for {k!r}: "
                    f"{(ent or {}).get('error')}"
                )
            out[k] = ent["value"]
        return out
    if btype == "aws_secrets_manager":
        # src/secrets/aws_secrets_manager.rs: GetSecretValue(secret_id),
        # SecretString is a JSON object of key -> value; a missing key
        # or an EMPTY value for a requested key errors (rs:88-103).
        # Rides the repo's SigV4 signer + AWS JSON-1.1 call (the same
        # path sqs/kinesis/cloudwatch use) instead of the SDK.
        import os

        region = bcfg.get("region", "us-east-1")
        endpoint = bcfg.get(
            "endpoint", f"https://secretsmanager.{region}.amazonaws.com")
        from vector_spark.sinks import _aws_json_call

        try:
            resp = _aws_json_call(
                endpoint, "secretsmanager",
                "secretsmanager.GetSecretValue",
                {"SecretId": bcfg["secret_id"]},
                access_key=bcfg.get(
                    "access_key", os.environ.get("AWS_ACCESS_KEY_ID", "")),
                secret_key=bcfg.get(
                    "secret_key",
                    os.environ.get("AWS_SECRET_ACCESS_KEY", "")),
                region=region,
                timeout_secs=float(bcfg.get("timeout", 10)),
            )
        except Exception as e:
            raise SecretError(
                f"{name}: GetSecretValue failed for secret-id "
                f"{bcfg.get('secret_id')!r}: {e}") from e
        secret_string = resp.get("SecretString")
        if secret_string is None:
            raise SecretError(
                f"{name}: secret for secret-id {bcfg.get('secret_id')!r} "
                "could not be retrieved")
        try:
            data = json.loads(secret_string)
        except ValueError as e:
            raise SecretError(
                f"{name}: SecretString is not a JSON object: {e}") from e
        out = {}
        for k in keys:
            v = data.get(k)
            if v is None:
                raise SecretError(
                    f"{name}: key {k!r} in secret with id "
                    f"{bcfg.get('secret_id')!r} does not exist")
            if v == "":
                raise SecretError(
                    f"{name}: value for key {k!r} in secret with id "
                    f"{bcfg.get('secret_id')!r} was empty")
            out[k] = str(v)
        return out
    raise SecretError(f"{name}: unknown secret backend type {btype!r}")


def resolve_secrets(cfg: dict) -> dict:
    """Resolve every SECRET[backend.key] in `cfg` and strip the `secret:`
    section. Returns a new config dict; no-op (same object) when the
    config has no secret references."""
    backends = cfg.get("secret") or {}
    refs: set[tuple[str, str]] = set()
    _collect_refs({k: v for k, v in cfg.items() if k != "secret"}, refs)
    if not refs:
        return {k: v for k, v in cfg.items() if k != "secret"} if backends else cfg

    by_backend: dict[str, list[str]] = {}
    for b, k in refs:
        by_backend.setdefault(b, []).append(k)
    values: dict[tuple[str, str], str] = {}
    for b, keys in sorted(by_backend.items()):
        if b not in backends:
            raise SecretError(f"unknown secret backend {b!r}")
        got = _resolve_backend(b, backends[b], sorted(keys))
        for k, v in got.items():
            values[(b, k)] = v

    def sub(node):
        if isinstance(node, str):
            return _SECRET_RE.sub(
                lambda m: values[(m.group(1), m.group(2))], node
            )
        if isinstance(node, dict):
            return {k: sub(v) for k, v in node.items()}
        if isinstance(node, list):
            return [sub(v) for v in node]
        return node

    return {k: sub(v) for k, v in cfg.items() if k != "secret"}
