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
