"""Result-dict serializers (the reference's 8 output sinks, as string renderers).

Re-expresses the recursive formatters of ``pdor/pdor_out.py`` in
Water-Run/pdf-drawing-ocr-recognition, byte-for-byte:

- plaintext  (ref :270-309) — **canonical**: this is the serialization bound to
  the north rule's "byte-identical extracted text per url" invariant.
- markdown   (ref :233-268)
- json       (ref :72-81; ``json.dump(indent=2, ensure_ascii=False)``)
- python     (ref :115-124; ``data = {repr(result)}`` module)
- xml        (ref :178-212; minidom, lists → ``item_{i}``, toprettyxml indent 2)
- value pretty-printer (ref :145-176; trailing commas, double-quoted strings)
- dict flatten (ref :214-231; dotted keys)

The reference writes these to files; here they are pure str→str renderers, used
both as DataFrame string columns and by driver-side writers in ``operators/sinks``.
The simpsave INI sink (ref :63-70) is ported since round 5 as
``render_simpsave``/``read_simpsave`` (clean-room INI emitter honoring the
ss.write/ss.read key→value contract — all 8 reference formats now dispatch);
YAML/TOML are gated behind import-try since those libs may be absent.
"""

from __future__ import annotations

import json
import xml.dom.minidom
from typing import Any, Dict

PLAINTEXT_TITLE = "PDOR识别结果"


def _dict_to_plaintext(data: Dict[str, Any], level: int = 0) -> str:
    """Recursive ``key: value`` lines, 2-space indent/level, lists as ``[i]:``
    items; empty list renders ``[]`` (ref pdor/pdor_out.py:270-296)."""
    indent = "  " * level
    out = ""
    for key, value in data.items():
        out += f"{indent}{key}: "
        if isinstance(value, dict):
            out += "\n" + _dict_to_plaintext(value, level + 1)
        elif isinstance(value, list):
            if not value:
                out += "[]\n"
            else:
                out += "\n"
                for index, item in enumerate(value):
                    if isinstance(item, dict):
                        out += f"{indent}  [{index}]:\n{_dict_to_plaintext(item, level + 2)}"
                    else:
                        out += f"{indent}  [{index}]: {item}\n"
        else:
            out += f"{value}\n"
    return out


def render_plaintext(data: Dict[str, Any]) -> str:
    """Full plaintext document: header + '='*50 + blank line + recursive body
    (ref pdor/pdor_out.py:298-309).  This exact string is ``extracted_text``."""
    return PLAINTEXT_TITLE + "\n" + "=" * 50 + "\n\n" + _dict_to_plaintext(data)


def _dict_to_markdown(data: Dict[str, Any], level: int = 0) -> str:
    """Recursive ``- **key**: `` bullets; list items as ``- 项目:`` for dicts
    (ref pdor/pdor_out.py:233-256)."""
    indent = "  " * level
    out = ""
    for key, value in data.items():
        out += f"{indent}- **{key}**: "
        if isinstance(value, dict):
            out += "\n" + _dict_to_markdown(value, level + 1)
        elif isinstance(value, list):
            out += "\n"
            for item in value:
                if isinstance(item, dict):
                    out += f"{indent}  - 项目:\n{_dict_to_markdown(item, level + 2)}"
                else:
                    out += f"{indent}  - {item}\n"
        else:
            out += f"{value}\n"
    return out


def render_markdown(data: Dict[str, Any]) -> str:
    """Markdown document with title header (ref pdor/pdor_out.py:258-268)."""
    return "# PDOR识别结果\n\n" + _dict_to_markdown(data)


def render_json(data: Dict[str, Any]) -> str:
    """``json.dumps`` with the reference's exact args (ref pdor/pdor_out.py:75)."""
    return json.dumps(data, ensure_ascii=False, indent=2)


def render_python(data: Dict[str, Any]) -> str:
    """Python module text ``data = {repr(result)}`` (ref pdor/pdor_out.py:115-124)."""
    return "# 由PDOR生成的Python数据文件\n\n" + f"data = {repr(data)}\n"


def render_simpsave(data: Dict[str, Any], key: str = "Pdor Result") -> str:
    """simpsave-style INI text — the reference's DEFAULT sink
    (``ss.write("Pdor Result", result, file=<base>.ini)``, ref
    pdor/pdor_out.py:63-70): the saved key becomes an INI section holding
    the value's type name and its ``repr``, recoverable by key with
    :func:`read_simpsave`.  Clean-room emitter of the documented simpsave
    model (key → typed repr in an INI file); the pip package is
    unobtainable offline, so the byte layout is pinned by OUR
    read_simpsave round-trip tests, not against upstream bytes — the user
    contract the reference prints ("read it back by key") is what is
    honored.  ``repr`` of standard containers never emits raw newlines
    (strings escape them), so each field stays one INI line; readers use
    RawConfigParser, so ``%`` needs no interpolation escaping."""
    return f"[{key}]\ntype = {type(data).__name__}\nvalue = {data!r}\n"


def read_simpsave(text: str, key: str = "Pdor Result") -> Any:
    """Recover the value :func:`render_simpsave` stored under *key* —
    the ``ss.read(key, file=...)`` twin (ast.literal_eval of the repr
    payload; raises KeyError for a missing key like simpsave does)."""
    import ast
    import configparser

    cp = configparser.RawConfigParser()
    cp.optionxform = str  # keys are case/char-preserving, as in simpsave
    cp.read_string(text)
    if not cp.has_section(key):
        raise KeyError(key)
    return ast.literal_eval(cp.get(key, "value"))


def render_xml(data: Dict[str, Any]) -> str:
    """minidom tree under root ``pdor_result``; nested dicts recurse, lists become
    ``item_{i}`` children, scalars become text nodes; ``toprettyxml(indent='  ')``
    (ref pdor/pdor_out.py:178-212)."""
    doc = xml.dom.minidom.getDOMImplementation().createDocument(None, "pdor_result", None)
    root = doc.documentElement

    def add(element, d: Dict[str, Any]) -> None:
        for key, value in d.items():
            child = doc.createElement(str(key))
            if isinstance(value, dict):
                element.appendChild(child)
                add(child, value)
            elif isinstance(value, list):
                element.appendChild(child)
                for i, item in enumerate(value):
                    item_elem = doc.createElement(f"item_{i}")
                    if isinstance(item, dict):
                        child.appendChild(item_elem)
                        add(item_elem, item)
                    else:
                        item_elem.appendChild(doc.createTextNode(str(item)))
                        child.appendChild(item_elem)
            else:
                child.appendChild(doc.createTextNode(str(value)))
                element.appendChild(child)

    add(root, data)
    return doc.toprettyxml(indent="  ")


def render_yaml(data: Dict[str, Any]) -> str:
    """YAML render (ref pdor/pdor_out.py:83-92); gated: pyyaml may be absent."""
    try:
        import yaml
    except ImportError as e:  # pragma: no cover - environment without pyyaml
        raise NotImplementedError("pyyaml not installed in this environment") from e
    return yaml.dump(data, allow_unicode=True, default_flow_style=False)


_TOML_ESCAPES = {
    "\\": "\\\\", '"': '\\"', "\b": "\\b", "\t": "\\t",
    "\n": "\\n", "\f": "\\f", "\r": "\\r",
}


def _toml_str(s: str) -> str:
    out = []
    for ch in s:
        if ch in _TOML_ESCAPES:
            out.append(_TOML_ESCAPES[ch])
        elif ord(ch) < 0x20 or ord(ch) == 0x7F:  # control chars incl. DEL
            out.append(f"\\u{ord(ch):04X}")
        else:
            out.append(ch)
    return '"' + "".join(out) + '"'


def _toml_key(k: str) -> str:
    return k if k and all(c.isalnum() or c in "_-" for c in k) and k.isascii() else _toml_str(k)


def _toml_value(v: Any) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return str(v)
    if isinstance(v, str):
        return _toml_str(v)
    if isinstance(v, list):
        return "[" + "".join(f" {_toml_value(x)}," for x in v) + "]"
    raise NotImplementedError(f"TOML value type {type(v).__name__}")


def _toml_dumps(data: Dict[str, Any], prefix: str = "") -> str:
    """Minimal TOML emitter in the layout of ``toml.dumps`` (scalars before
    tables, ``[ a, b,]`` inline arrays, dotted section headers).  Covers the
    value shapes the merge fold produces (str/int/float/bool/list/dict)."""
    lines = []
    tables = []
    for k, v in data.items():
        if isinstance(v, dict):
            tables.append((k, v))
        else:
            lines.append(f"{_toml_key(k)} = {_toml_value(v)}")
    out = "\n".join(lines) + ("\n" if lines else "")
    for k, v in tables:
        path = f"{prefix}.{_toml_key(k)}" if prefix else _toml_key(k)
        out += f"[{path}]\n" + _toml_dumps(v, path)
    return out


def render_toml(data: Dict[str, Any]) -> str:
    """TOML render (ref pdor/pdor_out.py:104-113).

    Uses the ``toml`` package's ``dumps`` when importable (byte parity with
    the reference); otherwise the built-in emitter above, whose output is
    asserted to ``tomllib``-round-trip back to the same data (test_sinks)."""
    try:
        import toml
    except ImportError:
        return _toml_dumps(data)
    return toml.dumps(data)


def format_value(value: Any, indent: int = 0) -> str:
    """Recursive pretty-printer with trailing commas; strings double-quoted
    (ref pdor/pdor_out.py:145-176)."""
    indent_str = "  " * indent
    if isinstance(value, dict):
        if not value:
            return "{}"
        out = "{\n"
        for k, v in value.items():
            out += f"{indent_str}  {k}: {format_value(v, indent + 1)},\n"
        out += f"{indent_str}}}"
        return out
    if isinstance(value, list):
        if not value:
            return "[]"
        out = "[\n"
        for item in value:
            out += f"{indent_str}  {format_value(item, indent + 1)},\n"
        out += f"{indent_str}]"
        return out
    if isinstance(value, str):
        return f'"{value}"'
    return str(value)


def flatten_dict(data: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    """Nested dict → flat dict with dotted keys (ref pdor/pdor_out.py:214-231)."""
    items: Dict[str, Any] = {}
    for k, v in data.items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            items.update(flatten_dict(v, key))
        else:
            items[key] = v
    return items
