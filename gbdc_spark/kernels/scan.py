"""Tiny text scanner mirroring the reference's StreamBuffer token ops
(/root/reference/src/util/StreamBuffer.h:131-338) for the raw-text ingest
and text-format hash kernels (OPB/PQBF/WCNF payloads)."""

from __future__ import annotations

__all__ = ["Scanner"]

_WS = " \t\n\r\f\v"


class Scanner:
    def __init__(self, text: str):
        self.s = text
        self.i = 0
        self.n = len(text)

    def eof(self) -> bool:
        return self.i >= self.n

    def peek(self) -> str:
        return self.s[self.i] if self.i < self.n else ""

    def skip(self) -> bool:
        self.i += 1
        return self.i < self.n

    def skip_whitespace(self) -> bool:
        while self.i < self.n and self.s[self.i] in _WS:
            self.i += 1
        return self.i < self.n

    def skip_line(self) -> bool:
        while self.i < self.n and self.s[self.i] != "\n":
            self.i += 1
        if self.i < self.n:
            self.i += 1
        return self.i < self.n

    def skip_string(self, t: str) -> None:
        for ch in t:
            if self.i < self.n and self.s[self.i] == ch:
                self.i += 1

    def skip_number(self) -> None:
        self.skip_whitespace()
        if self.i < self.n and self.s[self.i] in "+-":
            self.i += 1
        while self.i < self.n and self.s[self.i].isdigit():
            self.i += 1

    def read_number(self) -> str | None:
        """Digit string: keeps leading zeros and '-', drops a leading '+'
        (StreamBuffer.h:288-314).  None at EOF."""
        if not self.skip_whitespace():
            return None
        out = []
        c = self.s[self.i]
        if c == "-":
            out.append("-")
            if not self.skip():
                return None
        elif c == "+":
            if not self.skip():
                return None
        if not self.s[self.i].isdigit():
            if not self.skip_whitespace():
                return None
            if not self.s[self.i].isdigit():
                raise ValueError(f"unexpected character: {self.s[self.i]!r}")
        while self.i < self.n and self.s[self.i].isdigit():
            out.append(self.s[self.i])
            self.i += 1
        return "".join(out)

    def read_int(self) -> int | None:
        num = self.read_number()
        return None if num is None else int(num)
