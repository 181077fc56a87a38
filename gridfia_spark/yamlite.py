"""Minimal safe YAML-subset loader/dumper for config documents.

The reference's configs are YAML (`location_config.py:36-38` uses
``yaml.safe_load``; `config_templates.py` emits the same document shapes).
This sandbox ships no YAML library, so this module implements the small,
safe subset those documents actually use — block mappings, block sequences
(including sequences of mappings), flow lists/maps of scalars, quoted and
plain scalars, comments — as a stdlib-only parser.

Out-of-scope constructs RAISE ``ValueError`` instead of misparsing:
anchors/aliases (&, *), tags (!), multiline scalars (| and >), tab
indentation, multiple documents. That keeps the loader safe by
construction (it builds only dict/list/str/int/float/bool/None — the
same value universe as ``yaml.safe_load`` on these configs).
"""

from __future__ import annotations

import re

_INT = re.compile(r"^[+-]?\d+$")
_FLOAT = re.compile(r"^[+-]?(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?$")


def _strip_comment(line: str) -> str:
    """Remove a trailing comment, respecting single/double quotes."""
    out = []
    quote = None
    for i, ch in enumerate(line):
        if quote:
            out.append(ch)
            if ch == quote and (quote != '"' or not line[i - 1] == "\\"):
                quote = None
        elif ch in "'\"":
            quote = ch
            out.append(ch)
        elif ch == "#" and (i == 0 or line[i - 1] in " \t"):
            break
        else:
            out.append(ch)
    return "".join(out).rstrip()


def _scalar(tok: str):
    tok = tok.strip()
    if tok == "" or tok in ("~", "null", "Null", "NULL"):
        return None
    if tok in ("true", "True", "TRUE"):
        return True
    if tok in ("false", "False", "FALSE"):
        return False
    if tok[0] == "'" and tok[-1] == "'" and len(tok) >= 2:
        return tok[1:-1].replace("''", "'")
    if tok[0] == '"' and tok[-1] == '"' and len(tok) >= 2:
        return tok[1:-1].encode().decode("unicode_escape")
    if _INT.match(tok):
        return int(tok)
    if _FLOAT.match(tok):
        return float(tok)
    if tok[0] in "&*!|>":
        raise ValueError(f"unsupported YAML construct: {tok!r} "
                         "(anchors/aliases/tags/block scalars out of scope)")
    return tok


def _split_flow(body: str) -> list[str]:
    """Split a flow body on top-level commas (no nested flow supported)."""
    parts, depth, cur, quote = [], 0, [], None
    for ch in body:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
            cur.append(ch)
        elif ch in "[{":
            raise ValueError("nested flow collections out of scope")
        elif ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur or parts:
        parts.append("".join(cur))
    return parts


def _value(tok: str):
    tok = tok.strip()
    if tok.startswith("[") and tok.endswith("]"):
        body = tok[1:-1].strip()
        return [] if not body else [_scalar(p) for p in _split_flow(body)]
    if tok.startswith("{") and tok.endswith("}"):
        body = tok[1:-1].strip()
        out = {}
        if body:
            for part in _split_flow(body):
                if ":" not in part:
                    raise ValueError(f"bad flow mapping entry {part!r}")
                k, _, v = part.partition(":")
                out[str(_scalar(k))] = _scalar(v)
        return out
    return _scalar(tok)


def _split_key(content: str) -> tuple[str, str]:
    """(key, rest) of a mapping line — key ends at the first ':' that is
    followed by a space or end-of-line (so URLs in values survive)."""
    quote = None
    for i, ch in enumerate(content):
        if quote:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch == ":" and (i + 1 == len(content) or content[i + 1] in " \t"):
            return content[:i].strip(), content[i + 1 :].strip()
    raise ValueError(f"expected 'key: value' line, got {content!r}")


def _parse_block(lines: list[tuple[int, str]], i: int, indent: int):
    """Parse a block (mapping or sequence) whose entries sit at ``indent``."""
    if lines[i][1].startswith("- ") or lines[i][1] == "-":
        seq = []
        while i < len(lines) and lines[i][0] == indent and (
            lines[i][1].startswith("- ") or lines[i][1] == "-"
        ):
            ind, content = lines[i]
            body = content[2:].strip() if content != "-" else ""
            item_indent = ind + 2
            if body and (":" in body and _looks_like_mapping(body)):
                # "- key: value" — the item is a mapping whose first entry
                # is inline; continuation keys are more-indented lines
                lines[i] = (item_indent, body)
                val, i = _parse_block(lines, i, item_indent)
                seq.append(val)
            elif body:
                seq.append(_value(body))
                i += 1
            else:
                i += 1
                if i < len(lines) and lines[i][0] > ind:
                    val, i = _parse_block(lines, i, lines[i][0])
                    seq.append(val)
                else:
                    seq.append(None)
        return seq, i
    out: dict = {}
    while i < len(lines) and lines[i][0] == indent and not lines[i][1].startswith("- "):
        _, content = lines[i]
        key, rest = _split_key(content)
        key = str(_scalar(key))
        if key in out:
            raise ValueError(f"duplicate key {key!r}")
        if rest:
            out[key] = _value(rest)
            i += 1
        else:
            i += 1
            if i < len(lines) and lines[i][0] > indent:
                out[key], i = _parse_block(lines, i, lines[i][0])
            elif i < len(lines) and lines[i][0] == indent and (
                lines[i][1].startswith("- ") or lines[i][1] == "-"
            ):
                # block sequences are commonly indented level with their key
                out[key], i = _parse_block(lines, i, indent)
            else:
                out[key] = None
    return out, i


def _looks_like_mapping(body: str) -> bool:
    try:
        _split_key(body)
        return True
    except ValueError:
        return False


def safe_load(text: str):
    """Parse one YAML document from the supported subset."""
    raw = text.split("\n")
    lines: list[tuple[int, str]] = []
    for ln in raw:
        if "\t" in ln[: len(ln) - len(ln.lstrip())]:
            raise ValueError("tab indentation is not valid YAML")
        ln = _strip_comment(ln)
        if not ln.strip():
            continue
        if ln.strip() == "---" and not lines:
            continue
        if ln.strip() in ("---", "..."):
            if lines:
                break
            continue
        lines.append((len(ln) - len(ln.lstrip()), ln.strip()))
    if not lines:
        return None
    val, i = _parse_block(lines, 0, lines[0][0])
    if i != len(lines):
        raise ValueError(f"trailing content at line {i}: {lines[i][1]!r}")
    return val


def _dump_scalar(v) -> str:
    if v is None:
        return "null"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, (int, float)):
        return repr(v)
    s = str(v)
    if s == "" or s != s.strip() or any(c in s for c in ":#{}[]'\"&*!|>%@`,") or (
        _INT.match(s) or _FLOAT.match(s) or s.lower() in ("null", "true", "false", "~")
    ):
        return "'" + s.replace("'", "''") + "'"
    return s


def _dump_block(v, indent: int) -> list[str]:
    pad = "  " * indent
    if isinstance(v, dict):
        if not v:
            return [pad + "{}"]
        out = []
        for k, val in v.items():
            ks = _dump_scalar(k)
            if isinstance(val, dict) and val:
                out.append(f"{pad}{ks}:")
                out.extend(_dump_block(val, indent + 1))
            elif isinstance(val, list) and val:
                out.append(f"{pad}{ks}:")
                out.extend(_dump_block(val, indent))
            elif isinstance(val, dict):
                out.append(f"{pad}{ks}: {{}}")
            elif isinstance(val, list):
                out.append(f"{pad}{ks}: []")
            else:
                out.append(f"{pad}{ks}: {_dump_scalar(val)}")
        return out
    if isinstance(v, list):
        out = []
        for item in v:
            if isinstance(item, dict) and item:
                block = _dump_block(item, indent + 1)
                first = block[0].lstrip()
                out.append(f"{pad}- {first}")
                out.extend(block[1:])
            elif isinstance(item, (dict, list)):
                out.append(f"{pad}- {'{}' if isinstance(item, dict) else '[]'}")
            else:
                out.append(f"{pad}- {_dump_scalar(item)}")
        return out
    return [pad + _dump_scalar(v)]


def safe_dump(obj) -> str:
    """Emit the subset back out; safe_load(safe_dump(x)) == x for the
    supported value universe."""
    return "\n".join(_dump_block(obj, 0)) + "\n"
