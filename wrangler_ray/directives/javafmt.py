"""Java SimpleDateFormat → Python strptime/strftime pattern conversion.

The reference parses/format dates with Java patterns
(directives/parser/ParseSimpleDate.java, date/FormatDate.java). This maps the
common tokens; unsupported tokens pass through literally.
"""

from __future__ import annotations

import re

_TOKENS = [
    ("yyyy", "%Y"),
    ("yyy", "%Y"),
    ("yy", "%y"),
    ("MMMM", "%B"),
    ("MMM", "%b"),
    ("MM", "%m"),
    ("M", "%m"),
    ("dd", "%d"),
    ("d", "%d"),
    ("HH", "%H"),
    ("H", "%H"),
    ("hh", "%I"),
    ("h", "%I"),
    ("mm", "%M"),
    ("m", "%M"),
    ("ss", "%S"),
    ("s", "%S"),
    ("SSSSSS", "%f"),
    ("SSS", "%f"),
    ("EEEE", "%A"),
    ("EEE", "%a"),
    ("a", "%p"),
    ("XXX", "%z"),
    ("XX", "%z"),
    ("X", "%z"),
    ("ZZZZ", "%z"),
    ("Z", "%z"),
    ("zzz", "%Z"),
    ("z", "%Z"),
    ("G", ""),
]

_TOKEN_RE = re.compile("|".join(re.escape(t) for t, _ in _TOKENS))
_MAP = dict(_TOKENS)


def java_datefmt_to_py(fmt: str) -> str:
    out = []
    i = 0
    n = len(fmt)
    while i < n:
        c = fmt[i]
        if c == "'":
            # quoted literal
            j = fmt.find("'", i + 1)
            if j < 0:
                out.append(fmt[i + 1 :])
                break
            out.append(fmt[i + 1 : j].replace("%", "%%"))
            i = j + 1
            continue
        m = _TOKEN_RE.match(fmt, i)
        if m:
            out.append(_MAP[m.group(0)])
            i = m.end()
        else:
            out.append(c.replace("%", "%%"))
            i += 1
    return "".join(out)
