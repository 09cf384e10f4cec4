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
    "color": COLOR_RE,
    "phone": PHONE_RE,
    "image-fmt": IMAGE_FMT_RE,
    # d3 utc-millisec applies to numbers; string instances must be all digits.
    # Kept in the regex table so the Spark backend enforces it identically.
    "utc-millisec": r"^\d+$",
}


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
