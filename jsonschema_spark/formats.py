"""Format checkers (SURVEY.md §2 A23–A32) shared by both backends.

Each format has (a) a pure-Python checker used by the local evaluator and
(b) a Java-regex string used by the Spark compiler via ``rlike`` so the hot
path stays inside whole-stage codegen. The regexes are written in the common
ECMA/Java-compatible subset so both dialects agree (SURVEY.md A9 note).
"""

from __future__ import annotations

import re
from typing import Callable

# Regex sources — valid in both Python `re` and java.util.regex.
DATE_RE = r"^\d{4}-\d{2}-\d{2}$"
TIME_RE = r"^\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:\d{2})?$"
DATETIME_RE = (
    r"^\d{4}-(0[1-9]|1[0-2])-(0[1-9]|[12]\d|3[01])"
    r"[Tt]([01]\d|2[0-3]):[0-5]\d:([0-5]\d|60)(\.\d+)?"
    r"([Zz]|[+-]([01]\d|2[0-3]):[0-5]\d)$"
)
EMAIL_RE = r"^[A-Za-z0-9!#$%&'*+/=?^_`{|}~.-]+@[A-Za-z0-9]([A-Za-z0-9-]*[A-Za-z0-9])?(\.[A-Za-z0-9]([A-Za-z0-9-]*[A-Za-z0-9])?)+$"
HOSTNAME_RE = r"^(?=.{1,253}$)[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?(\.[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?)*$"
IPV4_RE = r"^((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)$"
IPV6_RE = (
    r"^(([0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}"
    r"|([0-9A-Fa-f]{1,4}:){1,7}:"
    r"|([0-9A-Fa-f]{1,4}:){1,6}:[0-9A-Fa-f]{1,4}"
    r"|([0-9A-Fa-f]{1,4}:){1,5}(:[0-9A-Fa-f]{1,4}){1,2}"
    r"|([0-9A-Fa-f]{1,4}:){1,4}(:[0-9A-Fa-f]{1,4}){1,3}"
    r"|([0-9A-Fa-f]{1,4}:){1,3}(:[0-9A-Fa-f]{1,4}){1,4}"
    r"|([0-9A-Fa-f]{1,4}:){1,2}(:[0-9A-Fa-f]{1,4}){1,5}"
    r"|[0-9A-Fa-f]{1,4}:((:[0-9A-Fa-f]{1,4}){1,6})"
    r"|:((:[0-9A-Fa-f]{1,4}){1,7}|:))$"
)
URI_RE = r"^[A-Za-z][A-Za-z0-9+.-]*:[^\s]*$"
# draft-6/7 additions (round 3). Pragmatic RFC approximations, same
# Java/Python-common dialect as the rest of the table.
URI_REFERENCE_RE = r"^[^\s<>\\^`{|}]*$"          # RFC 3986 URI-reference: no ws/delims
URI_TEMPLATE_RE = r"^([^\x00-\x20{}<>\\^`|]|\{[^{}]+\})*$"  # RFC 6570 level-1 shape
JSON_POINTER_RE = r"^(/([^/~]|~[01])*)*$"         # RFC 6901
REL_JSON_POINTER_RE = r"^(0|[1-9][0-9]*)(#|(/([^/~]|~[01])*)*)$"
UUID_RE = r"^[0-9A-Fa-f]{8}-[0-9A-Fa-f]{4}-[0-9A-Fa-f]{4}-[0-9A-Fa-f]{4}-[0-9A-Fa-f]{12}$"
DURATION_RE = (  # ISO 8601 / RFC 3339 appendix-A duration
    r"^P(?!$)(\d+Y)?(\d+M)?(\d+W)?(\d+D)?(T(?!$)(\d+H)?(\d+M)?(\d+(\.\d+)?S)?)?$"
)
# idn-* / iri variants: permissive — ASCII rules relaxed to any non-space,
# non-delimiter unicode (full IDNA/UTS-46 tables are out of scope; the spec
# marks format as best-effort and these never reject a valid identifier).
IDN_EMAIL_RE = r"^[^@\s]+@[^@\s]+$"
IDN_HOSTNAME_RE = r"^[^\s.]([^\s]{0,252})?$"
IRI_RE = r"^[A-Za-z][A-Za-z0-9+.-]*:[^\s]*$"
IRI_REFERENCE_RE = r"^[^\s<>\\^`{|}]*$"
COLOR_RE = r"^(#[0-9A-Fa-f]{3}|#[0-9A-Fa-f]{6}|[a-zA-Z]+)$"
PHONE_RE = r"^\+?[0-9 ().-]{5,}$"
# engine extension formats (SURVEY.md A32, BASELINE.json:15 columns)
IMAGE_FMT_RE = r"^(png|bmp|raw|jpeg)$"

# format name -> Java/ECMA-common regex (None = needs a Python checker only)
FORMAT_REGEXES: dict[str, str] = {
    "date-time": DATETIME_RE,
    "date": DATE_RE,
    "time": TIME_RE,
    "email": EMAIL_RE,
    "hostname": HOSTNAME_RE,
    "host-name": HOSTNAME_RE,
    "ipv4": IPV4_RE,
    "ip-address": IPV4_RE,
    "ipv6": IPV6_RE,
    "uri": URI_RE,
    "uri-reference": URI_REFERENCE_RE,
    "uri-template": URI_TEMPLATE_RE,
    "json-pointer": JSON_POINTER_RE,
    "relative-json-pointer": REL_JSON_POINTER_RE,
    "uuid": UUID_RE,
    "duration": DURATION_RE,
    "idn-email": IDN_EMAIL_RE,
    "idn-hostname": IDN_HOSTNAME_RE,
    "iri": IRI_RE,
    "iri-reference": IRI_REFERENCE_RE,
    "color": COLOR_RE,
    "phone": PHONE_RE,
    "image-fmt": IMAGE_FMT_RE,
    # d3 utc-millisec applies to numbers; string instances must be all digits.
    # Kept in the regex table so the Spark backend enforces it identically.
    "utc-millisec": r"^\d+$",
}


# --- draft-7 content keywords (§8) --------------------------------------
# The draft marks contentEncoding/contentMediaType SHOULD-validate; this is
# a validation engine, so both ASSERT (documented divergence from the
# annotate-only reading some libraries take). Base64 is the only encoding
# in the draft-7 registry we support; media types are sniffed by magic
# bytes — the natural check for an image+caption table, and expressible as
# a hex-prefix compare that stays inside whole-stage codegen.
BASE64_RE = r"^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?$"

# media type -> (offset, magic bytes); offset 0 unless noted
MEDIA_TYPE_MAGIC: dict[str, bytes] = {
    "image/png": b"\x89PNG\r\n\x1a\n",
    "image/jpeg": b"\xff\xd8\xff",
    "image/gif": b"GIF8",
    "image/bmp": b"BM",
    "image/webp": b"RIFF",  # RIFF container; bytes 8-11 say WEBP (checked locally)
}


def check_base64(s: str) -> bool:
    return re.fullmatch(BASE64_RE, s) is not None


def check_media_type(data: bytes | str, media_type: str) -> bool:
    """Local-evaluator media-type check on decoded (or raw) content."""
    if media_type == "application/json":
        import json
        try:
            json.loads(data if isinstance(data, str) else data.decode("utf-8"))
            return True
        except (ValueError, UnicodeDecodeError):
            return False
    magic = MEDIA_TYPE_MAGIC.get(media_type)
    if magic is None:
        return True  # unknown media type: permissive (never reject valid data)
    b = data.encode("utf-8", "surrogateescape") if isinstance(data, str) else data
    if not b.startswith(magic):
        return False
    if media_type == "image/webp":
        return len(b) >= 12 and b[8:12] == b"WEBP"
    return True


def _check_regex_format(s: str) -> bool:
    try:
        re.compile(s)
        return True
    except re.error:
        return False


def _mk(rx: str) -> Callable[[str], bool]:
    c = re.compile(rx)
    return lambda s: c.search(s) is not None


FORMAT_CHECKERS: dict[str, Callable[[str], bool]] = {
    name: _mk(rx) for name, rx in FORMAT_REGEXES.items()
}
FORMAT_CHECKERS["regex"] = _check_regex_format
# d3 utc-millisec applies to numbers; for strings require digits
FORMAT_CHECKERS["utc-millisec"] = lambda s: s.isdigit()
FORMAT_CHECKERS["style"] = lambda s: True  # d3 marks formats optional; permissive
