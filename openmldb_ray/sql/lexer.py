"""SQL tokenizer for the engine's front-end subset.

Hand-written (no parser deps in the container); covers the dialect the
reference compiles (hybridse/src/vm/sql_compiler.cc:322 front end):
identifiers, quoted strings, numbers (with OpenMLDB time-unit suffixes
2h/30m/10s/5d), operators, and the punctuation the grammar needs.
"""

from __future__ import annotations

from dataclasses import dataclass

KEYWORDS = {
    "SELECT", "DISTINCT", "FROM", "WHERE", "GROUP", "BY", "ORDER",
    "WINDOW", "AS", "AND", "OR", "NOT", "IS", "NULL", "LIKE", "ILIKE",
    "BETWEEN", "IN", "CASE", "WHEN", "THEN", "ELSE", "END", "CAST",
    "JOIN", "LEFT", "RIGHT", "LAST", "ASOF", "OUTER", "INNER", "ON",
    "LIMIT",
    "PARTITION", "ROWS", "RANGE", "ROWS_RANGE", "PRECEDING", "FOLLOWING",
    "CURRENT", "ROW", "UNBOUNDED", "OPEN", "MAXSIZE", "EXCLUDE",
    "CURRENT_TIME", "INSTANCE_NOT_IN_WINDOW", "UNION", "ALL", "DESC",
    "ASC", "INTERVAL", "OVER", "HAVING", "TIMESTAMP", "DATE", "WITH",
    "MOD", "DIV", "XOR", "ESCAPE", "CONFIG",
}

# multi-char operators first
_OPS = ["<>", "!=", ">=", "<=", "<<", ">>", "||", "==", "=", "<", ">",
        "+", "-", "*", "/", "%", "(", ")", ",", ".", ";", "!", "&",
        "^", "~", "|", "?"]

_UNIT_US = {"s": 1_000_000, "m": 60_000_000, "h": 3_600_000_000,
            "d": 86_400_000_000}


@dataclass
class Tok:
    kind: str       # KW | IDENT | NUM | STR | OP | END
    val: object
    pos: int


def tokenize(text: str) -> list[Tok]:
    toks: list[Tok] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c.isspace():
            i += 1
            continue
        if text.startswith("--", i):
            j = text.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if c == "`":  # backtick-quoted identifier
            j = text.find("`", i + 1)
            if j < 0:
                raise ValueError(f"unterminated quoted identifier at {i}")
            toks.append(Tok("IDENT", text[i + 1:j], i))
            i = j + 1
            continue
        if c in "'\"":
            q = c
            j = i + 1
            buf = []
            # minimal set matching observed reference behavior
            # (v040/test_like.yaml id 8: '\b' keeps the 'b', only the
            # slash drops); unknown escapes keep the char
            _ESC = {"\\": "\\", "'": "'", '"': '"', "`": "`"}
            while j < n:
                if text[j] == "\\" and j + 1 < n:
                    # backslash escapes ('\\' is one backslash —
                    # query/udf_query.yaml like_match escape args);
                    # unknown escapes keep the char, dropping the slash
                    nxt = text[j + 1]
                    buf.append(_ESC.get(nxt, nxt))
                    j += 2
                    continue
                if text[j] == q:
                    if j + 1 < n and text[j + 1] == q:  # escaped quote
                        buf.append(q)
                        j += 2
                        continue
                    break
                buf.append(text[j])
                j += 1
            if j >= n:
                raise ValueError(f"unterminated string at {i}")
            toks.append(Tok("STR", "".join(buf), i))
            i = j + 1
            continue
        if c.isdigit() or (c == "." and i + 1 < n and text[i + 1].isdigit()):
            j = i
            isfloat = False
            while j < n and (text[j].isdigit() or text[j] == "."):
                isfloat |= text[j] == "."
                j += 1
            if j < n and text[j] in "eE" and j + 1 < n and \
                    (text[j + 1].isdigit() or text[j + 1] in "+-"):
                isfloat = True
                j += 1
                if text[j] in "+-":
                    j += 1
                while j < n and text[j].isdigit():
                    j += 1
            # OpenMLDB time-unit literal (2h / 30m / 10s / 5d) — only
            # when NOT followed by more identifier chars
            if (not isfloat and j < n and text[j].lower() in _UNIT_US
                    and (j + 1 >= n or not (text[j + 1].isalnum()
                                            or text[j + 1] == "_"))):
                # duration literal (2h/30m/10s/5d): distinct kind so the
                # planner can reject time units in ROWS frame bounds
                # (cases/function/window/error_window.yaml id 8)
                val = int(text[i:j]) * _UNIT_US[text[j].lower()]
                toks.append(Tok("DUR", val, i))
                i = j + 1
                continue
            lit = text[i:j]
            # float-typed literal suffix: 0.0f / 1F (HybridSQL)
            if j < n and text[j] in "fF" and (
                    j + 1 >= n or not (text[j + 1].isalnum()
                                       or text[j + 1] == "_")):
                toks.append(Tok("NUM", float(lit), i))
                i = j + 1
                continue
            # bigint literal suffix: 0L / 15L (usecase/autox.yaml)
            if not isfloat and j < n and text[j] in "lL" and (
                    j + 1 >= n or not (text[j + 1].isalnum()
                                       or text[j + 1] == "_")):
                toks.append(Tok("NUM", int(lit), i))
                i = j + 1
                continue
            if j < n and (text[j].isalpha() or text[j] == "_"):
                # 0xFF / 100ss / 12abc: the reference rejects numeric
                # literals glued to identifier characters
                # (cases/plan/error_unsupport_sql.yaml id 6,
                # error_query.yaml id 6)
                raise ValueError(
                    f"malformed numeric literal at {i}: "
                    f"{text[i:j + 3]!r}")
            toks.append(Tok("NUM", float(lit) if isfloat else int(lit), i))
            i = j
            continue
        if c.isalpha() or c == "_":
            j = i
            while j < n and (text[j].isalnum() or text[j] == "_"):
                j += 1
            word = text[i:j]
            up = word.upper()
            if up in KEYWORDS:
                toks.append(Tok("KW", up, i))
            else:
                toks.append(Tok("IDENT", word, i))
            i = j
            continue
        for op in _OPS:
            if text.startswith(op, i):
                toks.append(Tok("OP", op, i))
                i += len(op)
                break
        else:
            raise ValueError(f"unexpected character {c!r} at {i}")
    toks.append(Tok("END", None, n))
    return toks
