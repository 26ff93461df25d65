"""Independent scalar golden decoder used as the test oracle.

A direct float64 NumPy transcription of the reference decoding *semantics*
(``src/decoding/decoder.cpp:11-78``): per-frame scalar loops, CSR-style
adjacency, forward/backward exclusion, break-before-increment early
termination.  Deliberately simple and slow — it exists only to pin down the
exact math the batched TPU decoder must reproduce.
"""

import numpy as np


def _sign(x):
    return 1.0 - 2.0 * float(np.signbit(x))


def jacobian(x, y):
    return _sign(x) * _sign(y) * min(abs(x), abs(y)) + np.log(
        (1 + np.exp(-abs(x + y))) / (1 + np.exp(-abs(x - y)))
    )


def minsum(x, y):
    return _sign(x) * _sign(y) * min(abs(x), abs(y))


class GoldenDecoder:
    def __init__(self, code, iterations=50, early_term=True, minsum_mode=False):
        self.code = code
        self.iterations = iterations
        self.early_term = early_term
        self.op = minsum if minsum_mode else jacobian
        # CSR adjacency in file order, like sparse_csr::read_from_file
        self.row_edges = [[] for _ in range(code.mc)]
        self.col_edges = [[] for _ in range(code.nc)]
        for e, (r, c) in enumerate(zip(code.rows, code.cols)):
            self.row_edges[r].append(e)
            self.col_edges[c].append(e)

    def is_codeword(self, hard):
        for edges in self.row_edges:
            s = 0
            for e in edges:
                s ^= int(hard[self.code.cols[e]])
            if s:
                return False
        return True

    def decode(self, llr_in):
        """Returns (llr_out, hard, iters)."""
        code = self.code
        nnz = code.nnz
        lv2c = np.zeros(nnz)
        lc2v = np.zeros(nnz)
        llr_out = np.zeros(code.nc)
        hard = np.zeros(code.nc, dtype=np.uint8)
        for e in range(nnz):
            lv2c[e] = llr_in[code.cols[e]]
        I = 0
        while I < self.iterations:
            # CN update with forward/backward exclusion
            for edges in self.row_edges:
                cw = len(edges)
                f = np.zeros(cw)
                b = np.zeros(cw)
                f[0] = lv2c[edges[0]]
                b[cw - 1] = lv2c[edges[cw - 1]]
                for j in range(1, cw):
                    f[j] = self.op(f[j - 1], lv2c[edges[j]])
                    b[cw - 1 - j] = self.op(b[cw - j], lv2c[edges[cw - j - 1]])
                lc2v[edges[0]] = b[1]
                lc2v[edges[cw - 1]] = f[cw - 2]
                for j in range(1, cw - 1):
                    lc2v[edges[j]] = self.op(f[j - 1], b[j + 1])
            # VN update
            for v in range(code.nc):
                s = llr_in[v]
                for e in self.col_edges[v]:
                    s += lc2v[e]
                llr_out[v] = s
                hard[v] = 1 if s <= 0 else 0
                for e in self.col_edges[v]:
                    lv2c[e] = s - lc2v[e]
            if self.early_term and self.is_codeword(hard):
                break
            I += 1
        return llr_out, hard, I


ERASURE = 2  # matches libldpc_tpu.ops.channel.BEC_ERASURE


class GoldenBECDecoder:
    """Scalar transcription of ``ldpc_decoder_bec::decode(channelInput)``
    (``src/decoding/decoder.cpp:91-192``) over the {0, 1, ERASURE} alphabet."""

    def __init__(self, code, iterations=50, early_term=True):
        self.code = code
        self.iterations = iterations
        self.early_term = early_term
        self.row_edges = [[] for _ in range(code.mc)]
        self.col_edges = [[] for _ in range(code.nc)]
        for e, (r, c) in enumerate(zip(code.rows, code.cols)):
            self.row_edges[r].append(e)
            self.col_edges[c].append(e)

    @staticmethod
    def cn_update(l, r):
        if l == ERASURE or r == ERASURE:
            return ERASURE
        return l ^ r

    @staticmethod
    def vn_update(l, r, xi):
        return xi if (l == xi or r == xi) else ERASURE

    def decode(self, symbols_in, codeword):
        code = self.code
        lv2c = np.zeros(code.nnz, dtype=np.int64)
        lc2v = np.zeros(code.nnz, dtype=np.int64)
        sym_out = np.full(code.nc, ERASURE, dtype=np.int64)
        hard = np.zeros(code.nc, dtype=np.uint8)
        for e in range(code.nnz):
            lv2c[e] = symbols_in[code.cols[e]]
        I = 0
        while I < self.iterations:
            for edges in self.row_edges:
                cw = len(edges)
                f = np.zeros(cw, dtype=np.int64)
                b = np.zeros(cw, dtype=np.int64)
                f[0] = lv2c[edges[0]]
                b[cw - 1] = lv2c[edges[cw - 1]]
                for j in range(1, cw):
                    f[j] = self.cn_update(f[j - 1], lv2c[edges[j]])
                    b[cw - 1 - j] = self.cn_update(b[cw - j], lv2c[edges[cw - j - 1]])
                lc2v[edges[0]] = b[1]
                lc2v[edges[cw - 1]] = f[cw - 2]
                for j in range(1, cw - 1):
                    lc2v[edges[j]] = self.cn_update(f[j - 1], b[j + 1])
            for v in range(code.nc):
                xi = int(codeword[v])
                edges = self.col_edges[v]
                if symbols_in[v] != ERASURE:
                    for e in edges:
                        lv2c[e] = xi
                    sym_out[v] = xi
                    hard[v] = xi
                else:
                    vw = len(edges)
                    f = np.zeros(vw, dtype=np.int64)
                    b = np.zeros(vw, dtype=np.int64)
                    f[0] = lc2v[edges[0]]
                    b[vw - 1] = lc2v[edges[vw - 1]]
                    for j in range(1, vw):
                        f[j] = self.vn_update(f[j - 1], lc2v[edges[j]], xi)
                        b[vw - 1 - j] = self.vn_update(
                            b[vw - j], lc2v[edges[vw - j - 1]], xi
                        )
                    if vw >= 2:
                        lv2c[edges[0]] = b[1]
                        lv2c[edges[vw - 1]] = f[vw - 2]
                        for j in range(1, vw - 1):
                            lv2c[edges[j]] = self.vn_update(f[j - 1], b[j + 1], xi)
                    else:
                        lv2c[edges[0]] = ERASURE
                    sym_out[v] = f[vw - 1]
                    hard[v] = (1 - xi) if sym_out[v] == ERASURE else xi
            if self.early_term and not (sym_out == ERASURE).any():
                break
            I += 1
        return sym_out, hard, I


def layered_qc_golden(
    code,
    llr_in,
    iterations=32,
    early_term=True,
    minsum_mode="BP_MS",
    message_dtype="float32",
    quant_scale=0.1875,
):
    """Vectorised NumPy golden of the FAST layered engine recursion
    (``ops/pallas/decode_lanes.kernel_layered_qc``): persistent APP in
    wide (f32) accumulation, per-layer ``Lv2c = clip(app - Lc2v_stale)``
    gather / CN exclusion / ``app += Lc2v_new - Lc2v_stale`` scatter,
    early termination once per full iteration.  Operates on the base
    matrix in the code's ORIGINAL labelling; segment order within a layer
    is ascending base column (the CN position order of row/col-sorted
    edge files — matching the kernel's ``ac`` ordering on
    ``expand_qc``-built codes).

    ``llr_in`` is ``[nc, B]`` float32.  Returns
    ``(llr_out [nc, B], iterations [B], is_codeword [B])`` — for
    ``message_dtype="int8"`` the returned posteriors are in LLR units
    (dequantised), like the kernel wrapper's output.
    """
    Z, base = code.qc
    base = np.asarray(base)
    mb, nb = base.shape
    B = llr_in.shape[1]
    mode = minsum_mode
    kind = mode[0] if isinstance(mode, tuple) else mode
    quantized = message_dtype == "int8"
    if message_dtype == "bfloat16":
        import ml_dtypes

        def to_msg(x):
            return x.astype(ml_dtypes.bfloat16).astype(np.float32)
    elif quantized:
        def to_msg(x):
            return np.clip(np.round(x), -127.0, 127.0)
    else:
        def to_msg(x):
            return x.astype(np.float32)

    def sgn(x):
        return 1.0 - 2.0 * np.signbit(x).astype(np.float32)

    def op(x, y):
        if kind in ("BP_MS", "BP_NMS", "BP_OMS", True):
            return sgn(x) * sgn(y) * np.minimum(np.abs(x), np.abs(y))
        # boxplus (f32, softplus form like ops/cn_ops.boxplus)
        x = x.astype(np.float32)
        y = y.astype(np.float32)

        def sp(t):
            return np.logaddexp(0.0, t).astype(np.float32)

        return (
            sgn(x) * sgn(y) * np.minimum(np.abs(x), np.abs(y))
            + sp(-np.abs(x + y)) - sp(-np.abs(x - y))
        ).astype(np.float32)

    def post(x):
        if not isinstance(mode, tuple):
            return x
        k, scale, offset = mode
        if quantized and k == "BP_OMS":
            offset = offset / quant_scale
        if k == "BP_NMS":
            return x * np.float32(scale)
        if k == "BP_OMS":
            return sgn(x) * np.maximum(np.abs(x) - np.float32(offset), 0.0)
        return x

    app = llr_in.T.astype(np.float32).copy()  # [B, nc]
    if quantized:
        app = app * np.float32(1.0 / quant_scale)
    layers = [
        [(c, int(base[r, c])) for c in range(nb) if base[r, c] >= 0]
        for r in range(mb)
    ]
    lc2v = {
        (r, c): np.zeros((B, Z), np.float32)
        for r, segs in enumerate(layers) for c, _s in segs
    }
    done = np.zeros(B, bool)
    iters = np.zeros(B, np.int32)
    iscw = np.zeros(B, bool)

    def syndrome():
        viol = np.zeros(B, np.int64)
        for r, segs in enumerate(layers):
            bits = np.zeros((B, Z), np.int64)
            for c, s in segs:
                acn = np.roll(app[:, c * Z : (c + 1) * Z], -s, axis=1)
                bits += (acn <= 0)
            viol += (bits & 1).sum(axis=1)
        return viol == 0

    for _ in range(iterations):
        if early_term and done.all():
            break
        active = ~done
        for r, segs in enumerate(layers):
            lv = []
            stale = []
            for c, s in segs:
                acn = np.roll(app[:, c * Z : (c + 1) * Z], -s, axis=1)
                st = lc2v[(r, c)]
                lv.append(to_msg(acn - st))
                stale.append(st)
            d = len(lv)
            if d == 1:
                outs = [np.full_like(lv[0], 1e30)]
            else:
                fwd = [lv[0]]
                bwd = [lv[d - 1]]
                for j in range(1, d):
                    fwd.append(op(fwd[-1], lv[j]))
                    bwd.append(op(bwd[-1], lv[d - 1 - j]))
                outs = [bwd[d - 2]]
                for j in range(1, d - 1):
                    outs.append(op(fwd[j - 1], bwd[d - 2 - j]))
                outs.append(fwd[d - 2])
            for (c, s), o, st in zip(segs, outs, stale):
                o = post(o)
                o = to_msg(o) if quantized else (
                    o if message_dtype == "float32" else to_msg(o))
                delta = np.roll(o - st, s, axis=1)
                app[active, c * Z : (c + 1) * Z] += delta[active]
                lc2v[(r, c)][active] = o[active]
        if early_term:
            is_cw = syndrome()
            newly = active & is_cw
            iters[active & ~newly] += 1
            iscw[active] = is_cw[active]
            done |= newly
    if not early_term:
        iters[:] = iterations
        iscw = syndrome()
    llr_out = app.T.astype(np.float32)
    if quantized:
        llr_out = llr_out * np.float32(quant_scale)
    return llr_out, iters, iscw
