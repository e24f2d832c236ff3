"""PDF functions (PDF 32000-1 §7.10): types 0 (sampled), 2
(exponential), 3 (stitching), 4 (PostScript calculator).

The reference implements the same four types as declarative models +
evaluators (src/function/mod.rs:19-37 and submodules); here they power
Separation / DeviceN tint transforms in image decode (images.py). All
evaluation is pure Python over a handful of DISTINCT input tuples per
image (tint LUTs are built once per image, never per pixel), so there is
no vectorization pressure.
"""

from __future__ import annotations

import math
import struct

from .objects import NULL, PdfParseError, Stream


def _nums(v) -> list[float]:
    return [float(x) for x in v]


def _interp(x: float, x0: float, x1: float, y0: float, y1: float) -> float:
    if x1 == x0:
        return y0
    return y0 + (x - x0) * (y1 - y0) / (x1 - x0)


def _clip(x: float, lo: float, hi: float) -> float:
    return lo if x < lo else hi if x > hi else x


class PdfFunction:
    """Parsed, evaluatable PDF function. ``__call__(inputs) -> outputs``
    (floats, clipped to Range when present, per §7.10.1)."""

    def __init__(self, obj, resolve):
        d = obj.dict if isinstance(obj, Stream) else obj
        if not isinstance(d, dict):
            raise PdfParseError("function is not a dict/stream")
        self.type = resolve(d.get("FunctionType"))
        dom = resolve(d.get("Domain", NULL))
        if not isinstance(dom, list):
            raise PdfParseError("function missing Domain")
        self.domain = _nums([resolve(x) for x in dom])
        rng = resolve(d.get("Range", NULL))
        self.range = (
            _nums([resolve(x) for x in rng]) if isinstance(rng, list) else None
        )
        self._resolve = resolve
        if self.type == 0:
            self._init_sampled(obj, d, resolve)
        elif self.type == 2:
            self._init_exponential(d, resolve)
        elif self.type == 3:
            self._init_stitching(d, resolve)
        elif self.type == 4:
            self._init_ps(obj, resolve)
        else:
            raise PdfParseError(f"unsupported FunctionType {self.type}")

    # -- type 0: sampled -----------------------------------------------------

    def _init_sampled(self, obj, d, resolve):
        if not isinstance(obj, Stream):
            raise PdfParseError("type-0 function must be a stream")
        if self.range is None:
            raise PdfParseError("type-0 function missing Range")
        from .filters import decode_stream

        self.size = [int(resolve(x)) for x in resolve(d.get("Size"))]
        self.bps = int(resolve(d.get("BitsPerSample")))
        if self.bps not in (1, 2, 4, 8, 12, 16, 24, 32):
            raise PdfParseError(f"bad BitsPerSample {self.bps}")
        m = len(self.size)
        n = len(self.range) // 2
        enc = resolve(d.get("Encode", NULL))
        self.encode = (
            _nums([resolve(x) for x in enc])
            if isinstance(enc, list)
            else [v for s in self.size for v in (0.0, float(s - 1))]
        )
        dec = resolve(d.get("Decode", NULL))
        self.decode = (
            _nums([resolve(x) for x in dec])
            if isinstance(dec, list)
            else list(self.range)
        )
        data = decode_stream(obj, resolve=resolve)
        total = n
        for s in self.size:
            total *= s
        self.samples = self._unpack(data, total)
        self.n_out = n
        self.m_in = m

    def _unpack(self, data: bytes, count: int) -> list[int]:
        bps = self.bps
        out: list[int] = []
        if bps == 8:
            out = list(data[:count])
        elif bps == 16:
            out = list(struct.unpack(f">{count}H", data[: 2 * count]))
        elif bps == 32:
            out = list(struct.unpack(f">{count}I", data[: 4 * count]))
        else:
            acc = 0
            nbits = 0
            for b in data:
                acc = (acc << 8) | b
                nbits += 8
                while nbits >= bps and len(out) < count:
                    nbits -= bps
                    out.append((acc >> nbits) & ((1 << bps) - 1))
                acc &= (1 << nbits) - 1
                if len(out) >= count:
                    break
        if len(out) < count:
            raise PdfParseError("type-0 function: short sample data")
        return out

    def _sample_at(self, idx: list[int]) -> list[float]:
        flat = 0
        stride = 1
        for k, i in enumerate(idx):  # first input varies fastest (§7.10.2)
            flat += i * stride
            stride *= self.size[k]
        smax = float((1 << self.bps) - 1)
        base = flat * self.n_out
        return [
            _interp(
                self.samples[base + j],
                0.0,
                smax,
                self.decode[2 * j],
                self.decode[2 * j + 1],
            )
            for j in range(self.n_out)
        ]

    def _eval_sampled(self, xs: list[float]) -> list[float]:
        m = self.m_in
        # encode inputs to sample-grid coordinates
        es: list[float] = []
        for i in range(m):
            x = _clip(xs[i], self.domain[2 * i], self.domain[2 * i + 1])
            e = _interp(
                x,
                self.domain[2 * i],
                self.domain[2 * i + 1],
                self.encode[2 * i],
                self.encode[2 * i + 1],
            )
            es.append(_clip(e, 0.0, float(self.size[i] - 1)))
        # multilinear interpolation over the 2^m surrounding grid points
        lo = [min(int(math.floor(e)), self.size[i] - 1) for i, e in enumerate(es)]
        frac = [es[i] - lo[i] for i in range(m)]
        out = [0.0] * self.n_out
        for corner in range(1 << m):
            w = 1.0
            idx = []
            for i in range(m):
                if corner & (1 << i):
                    idx.append(min(lo[i] + 1, self.size[i] - 1))
                    w *= frac[i]
                else:
                    idx.append(lo[i])
                    w *= 1.0 - frac[i]
            if w == 0.0:
                continue
            sv = self._sample_at(idx)
            for j in range(self.n_out):
                out[j] += w * sv[j]
        return out

    # -- type 2: exponential -------------------------------------------------

    def _init_exponential(self, d, resolve):
        c0 = resolve(d.get("C0", NULL))
        c1 = resolve(d.get("C1", NULL))
        self.c0 = (
            _nums([resolve(x) for x in c0]) if isinstance(c0, list) else [0.0]
        )
        self.c1 = (
            _nums([resolve(x) for x in c1]) if isinstance(c1, list) else [1.0]
        )
        self.exp_n = float(resolve(d.get("N", 1)))

    def _eval_exponential(self, xs: list[float]) -> list[float]:
        x = _clip(xs[0], self.domain[0], self.domain[1])
        xn = x**self.exp_n
        return [
            c0 + xn * (c1 - c0) for c0, c1 in zip(self.c0, self.c1)
        ]

    # -- type 3: stitching ---------------------------------------------------

    def _init_stitching(self, d, resolve):
        fns = resolve(d.get("Functions"))
        self.subs = [PdfFunction(resolve(f), resolve) for f in fns]
        self.bounds = _nums(
            [resolve(x) for x in resolve(d.get("Bounds", []))]
        )
        self.st_encode = _nums(
            [resolve(x) for x in resolve(d.get("Encode"))]
        )

    def _eval_stitching(self, xs: list[float]) -> list[float]:
        x = _clip(xs[0], self.domain[0], self.domain[1])
        k = 0
        while k < len(self.bounds) and x >= self.bounds[k]:
            k += 1
        lo = self.domain[0] if k == 0 else self.bounds[k - 1]
        hi = (
            self.domain[1]
            if k == len(self.bounds)
            else self.bounds[k]
        )
        e = _interp(
            x, lo, hi, self.st_encode[2 * k], self.st_encode[2 * k + 1]
        )
        return self.subs[k]([e])

    # -- type 4: PostScript calculator ----------------------------------------

    def _init_ps(self, obj, resolve):
        if not isinstance(obj, Stream):
            raise PdfParseError("type-4 function must be a stream")
        from .filters import decode_stream

        src = decode_stream(obj, resolve=resolve).decode("latin-1")
        self.prog = _ps_parse(src)

    def _eval_ps(self, xs: list[float]) -> list[float]:
        m = len(self.domain) // 2
        stack = [
            _clip(xs[i], self.domain[2 * i], self.domain[2 * i + 1])
            for i in range(m)
        ]
        _ps_exec(self.prog, stack)
        if self.range is not None:
            n = len(self.range) // 2
            outs = stack[-n:]
            return [
                _clip(outs[j], self.range[2 * j], self.range[2 * j + 1])
                for j in range(n)
            ]
        return stack

    # -- dispatch --------------------------------------------------------------

    def __call__(self, xs: list[float]) -> list[float]:
        if self.type == 0:
            out = self._eval_sampled(xs)
        elif self.type == 2:
            out = self._eval_exponential(xs)
        elif self.type == 3:
            out = self._eval_stitching(xs)
        else:
            out = self._eval_ps(xs)
        if self.range is not None:
            out = [
                _clip(out[j], self.range[2 * j], self.range[2 * j + 1])
                for j in range(len(self.range) // 2)
            ]
        return out


# -- PostScript calculator mini-interpreter (§7.10.5) -------------------------


def _ps_parse(src: str):
    """Parse `{ ... }` into a nested token list (numbers, operator
    strings, sub-procedures as lists)."""
    toks: list[str] = []
    cur = ""
    for ch in src:
        if ch in "{}" or ch.isspace():
            if cur:
                toks.append(cur)
                cur = ""
            if ch in "{}":
                toks.append(ch)
        else:
            cur += ch
    if cur:
        toks.append(cur)

    def build(pos: int):
        out = []
        while pos < len(toks):
            t = toks[pos]
            if t == "{":
                sub, pos = build(pos + 1)
                out.append(sub)
            elif t == "}":
                return out, pos + 1
            else:
                try:
                    out.append(int(t))
                except ValueError:
                    try:
                        out.append(float(t))
                    except ValueError:
                        out.append(t)
                pos += 1
        return out, pos

    prog, _ = build(0)
    # the whole program is wrapped in one outer { }
    if len(prog) == 1 and isinstance(prog[0], list):
        return prog[0]
    return prog


def _cvi(x) -> int:
    return int(x)  # truncation toward zero, like PostScript cvi


def _ps_exec(prog, stack: list) -> None:  # noqa: C901 (flat dispatch)
    i = 0
    while i < len(prog):
        t = prog[i]
        i += 1
        if isinstance(t, (int, float, list)):
            stack.append(t)
            continue
        op = t
        if op == "add":
            b, a = stack.pop(), stack.pop()
            stack.append(a + b)
        elif op == "sub":
            b, a = stack.pop(), stack.pop()
            stack.append(a - b)
        elif op == "mul":
            b, a = stack.pop(), stack.pop()
            stack.append(a * b)
        elif op == "div":
            b, a = stack.pop(), stack.pop()
            stack.append(a / b)
        elif op == "idiv":
            b, a = stack.pop(), stack.pop()
            stack.append(_cvi(_cvi(a) / _cvi(b)) if b else 0)
        elif op == "mod":
            b, a = stack.pop(), stack.pop()
            stack.append(math.fmod(_cvi(a), _cvi(b)) if b else 0)
        elif op == "neg":
            stack.append(-stack.pop())
        elif op == "abs":
            stack.append(abs(stack.pop()))
        elif op == "ceiling":
            stack.append(float(math.ceil(stack.pop())))
        elif op == "floor":
            stack.append(float(math.floor(stack.pop())))
        elif op == "round":
            v = stack.pop()
            # PostScript rounds half away from zero
            stack.append(float(math.floor(v + 0.5)) if v >= 0 else -float(math.floor(-v + 0.5)))
        elif op == "truncate":
            stack.append(float(_cvi(stack.pop())))
        elif op == "sqrt":
            stack.append(math.sqrt(stack.pop()))
        elif op == "sin":
            stack.append(math.sin(math.radians(stack.pop())))
        elif op == "cos":
            stack.append(math.cos(math.radians(stack.pop())))
        elif op == "atan":
            den, num = stack.pop(), stack.pop()
            ang = math.degrees(math.atan2(num, den))
            stack.append(ang + 360.0 if ang < 0 else ang)
        elif op == "exp":
            b, a = stack.pop(), stack.pop()
            stack.append(a**b)
        elif op == "ln":
            stack.append(math.log(stack.pop()))
        elif op == "log":
            stack.append(math.log10(stack.pop()))
        elif op == "cvi":
            stack.append(_cvi(stack.pop()))
        elif op == "cvr":
            stack.append(float(stack.pop()))
        elif op == "dup":
            stack.append(stack[-1])
        elif op == "pop":
            stack.pop()
        elif op == "exch":
            stack[-1], stack[-2] = stack[-2], stack[-1]
        elif op == "copy":
            n = _cvi(stack.pop())
            if n > 0:
                stack.extend(stack[-n:])
        elif op == "index":
            n = _cvi(stack.pop())
            stack.append(stack[-1 - n])
        elif op == "roll":
            j = _cvi(stack.pop())
            n = _cvi(stack.pop())
            if n > 0:
                j %= n
                if j:
                    part = stack[-n:]
                    del stack[-n:]
                    stack.extend(part[-j:] + part[:-j])
        elif op in ("eq", "ne", "gt", "ge", "lt", "le"):
            b, a = stack.pop(), stack.pop()
            res = {
                "eq": a == b,
                "ne": a != b,
                "gt": a > b,
                "ge": a >= b,
                "lt": a < b,
                "le": a <= b,
            }[op]
            stack.append(res)
        elif op in ("and", "or", "xor"):
            b, a = stack.pop(), stack.pop()
            if isinstance(a, bool) and isinstance(b, bool):
                res = (
                    (a and b)
                    if op == "and"
                    else (a or b) if op == "or" else (a != b)
                )
            else:
                ai, bi = _cvi(a), _cvi(b)
                res = (
                    ai & bi if op == "and" else ai | bi if op == "or" else ai ^ bi
                )
            stack.append(res)
        elif op == "not":
            a = stack.pop()
            stack.append((not a) if isinstance(a, bool) else ~_cvi(a))
        elif op == "bitshift":
            sh, a = _cvi(stack.pop()), _cvi(stack.pop())
            stack.append(a << sh if sh >= 0 else a >> -sh)
        elif op == "true":
            stack.append(True)
        elif op == "false":
            stack.append(False)
        elif op == "if":
            proc = stack.pop()
            cond = stack.pop()
            if cond:
                _ps_exec(proc, stack)
        elif op == "ifelse":
            proc2 = stack.pop()
            proc1 = stack.pop()
            cond = stack.pop()
            _ps_exec(proc1 if cond else proc2, stack)
        else:
            raise PdfParseError(f"type-4 function: unknown op {op!r}")
