"""Hyperlink normalization.

The reference stores hyperlinks as ``AnyUrl | Path``
(html_backend.py:476-485): pydantic ``AnyUrl`` when the href is an
absolute URL, else a ``Path`` fallback for relative links. Both are
rendered via ``str()`` in markdown. This module reproduces the two
observable normalizations on plain strings:

* absolute URL -> WHATWG-ish normalization (lowercase scheme/host, drop
  default port, empty path becomes "/", spaces and non-ASCII
  percent-encoded);
* relative href -> POSIX path normalization (collapse duplicate
  slashes, drop trailing slash) like ``str(pathlib.PurePosixPath(x))``.
"""

from __future__ import annotations

import posixpath
from urllib.parse import urlsplit

_DEFAULT_PORTS = {"http": "80", "https": "443", "ws": "80", "wss": "443", "ftp": "21"}

# characters that stay verbatim in path/query/fragment; existing %XX kept
_SAFE = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
    "-._~!$&'()*+,;=:@/?#[]%"
)


def _quote_component(s: str) -> str:
    out = []
    for ch in s:
        if ch in _SAFE:
            out.append(ch)
        else:
            out.append("".join(f"%{b:02X}" for b in ch.encode("utf-8")))
    return "".join(out)


def _posix_norm(href: str) -> str:
    """str(PurePosixPath(href)) without importing pathlib in the hot loop."""
    if not href:
        return "."
    # PurePosixPath keeps a leading '//' but collapses others and drops
    # trailing slashes; it does not resolve '..'.
    leading = ""
    if href.startswith("//") and not href.startswith("///"):
        leading = "/"
    parts = [p for p in href.split("/") if p]
    if href.startswith("/"):
        return leading + "/" + "/".join(parts) if parts else leading + "/"
    return "/".join(parts) if parts else "."


def normalize_hyperlink(href: str) -> str:
    """Reference behavior at html_backend.py:480-484: try AnyUrl, fall
    back to Path for relative links."""
    s = urlsplit(href)
    if not s.scheme or (not s.netloc and s.scheme not in ("mailto", "tel", "data", "urn", "file")):
        # pydantic AnyUrl raises on missing scheme/host -> Path fallback
        return _posix_norm(href)
    scheme = s.scheme.lower()
    netloc = s.netloc
    host = s.hostname or ""
    try:
        host_norm = host.encode("idna").decode("ascii") if host and not host.isascii() else host.lower()
    except UnicodeError:
        host_norm = host.lower()
    port = s.port
    userinfo = ""
    if "@" in netloc:
        userinfo = netloc.rsplit("@", 1)[0] + "@"
    netloc_norm = userinfo + host_norm
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc_norm += f":{port}"
    path = _quote_component(s.path)
    if netloc_norm and not path:
        path = "/"
    out = f"{scheme}:"
    if netloc_norm or scheme in ("http", "https", "ws", "wss", "ftp", "file"):
        out += f"//{netloc_norm}"
    out += path
    if s.query:
        out += "?" + _quote_component(s.query)
    if s.fragment:
        out += "#" + _quote_component(s.fragment)
    return out
