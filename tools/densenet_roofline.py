"""Analytic roofline for the DenseNet161 forward (VERDICT r4 next #4:
explain the measured 14.3% MFU or fix it).

DenseNet's dense connectivity makes its compute/traffic ratio collapse as
blocks deepen: every dense layer re-reads the full growing concat input
(c_i = c0 + 48*i channels) for its 1x1 bottleneck, and the concat output
is rewritten layer after layer unless XLA elides it. The MACs grow only
linearly in c_i while the (re)read/(re)write traffic grows the same way —
so unlike VGG/ResNet (done once per tensor), the SAME activation bytes
are touched O(layers) times per block, and the arithmetic intensity stays
near the bandwidth roofline's knee for the whole back half of the net.

This tool states the intrinsic bound: per block, FLOPs (2/MAC, matching
XLA cost-analysis convention) and two traffic models —
  best  : concat never materialized (layer reads the c_i input, writes
          only its 48 new channels; norm/relu fused into the convs)
  worst : each layer's concat is materialized (read c_i + write c_i+48)
— then min time = max(flops/MXU_peak, bytes/HBM_bw) and the MFU ceiling
that implies. Run it anywhere (pure arithmetic, no device needed):

    python tools/densenet_roofline.py [batch]

Reference topology: torchvision densenet161 = reference encoder.py:18-22
(blocks 6/12/36/24, growth 48, bn_size 4, stem 96ch); ours
sat_tpu/models/encoder.py densenet161_forward.
"""

import sys

BLOCKS = (6, 12, 36, 24)
GROWTH = 48
BN_SIZE = 4
INIT = 96

MXU_PEAK = 197e12          # v5e bf16 FLOP/s (2/MAC)
HBM_BW = 819e9             # v5e HBM bytes/s
F32 = 4


def block_model(batch, hw, c0, n_layers):
    """(flops, best_bytes, worst_bytes) for one dense block at spatial
    hw*hw with c0 input channels."""
    inter = BN_SIZE * GROWTH
    px = batch * hw * hw
    flops = best = worst = 0.0
    c = c0
    for _ in range(n_layers):
        # conv1 1x1 c->inter, conv2 3x3 inter->growth (2 FLOPs/MAC)
        flops += 2.0 * px * c * inter + 2.0 * px * 9 * inter * GROWTH
        # best: read x(c) once, write the 48 fresh channels + the small
        # inter tensor round-trip (conv1 out -> conv2 in)
        best += F32 * px * (c + 2 * inter + GROWTH)
        c += GROWTH
    # worst model: best + per-layer concat rewrite of the full tensor
    # (read c + write c+GROWTH per layer)
    c, worst = c0, best
    for _ in range(n_layers):
        worst += F32 * px * (2 * c + GROWTH)
        c += GROWTH
    return flops, best, worst, c


def main(batch=64):
    hw, c = 56, INIT
    rows = []
    tot = [0.0, 0.0, 0.0]
    for bi, n in enumerate(BLOCKS, start=1):
        flops, best, worst, c = block_model(batch, hw, c, n)
        if bi < 4:  # transition: 1x1 conv c->c/2 + avgpool
            px = batch * hw * hw
            flops += 2.0 * px * c * (c // 2)
            best += F32 * px * (c + c // 2)
            worst += F32 * px * (c + c // 2)
            c //= 2
            hw //= 2
        rows.append((f"block{bi}", flops, best, worst))
        for i, v in enumerate((flops, best, worst)):
            tot[i] += v
    print(f"{'block':8} {'GFLOP':>8} {'best GB':>8} {'worst GB':>9} "
          f"{'t_mxu ms':>9} {'t_bw best/worst ms':>19} {'MFU ceil %':>11}")
    for name, flops, best, worst in rows:
        t_mxu = flops / MXU_PEAK
        t_b, t_w = best / HBM_BW, worst / HBM_BW
        ceil = flops / max(t_mxu, t_b) / MXU_PEAK * 100
        ceil_w = flops / max(t_mxu, t_w) / MXU_PEAK * 100
        print(f"{name:8} {flops/1e9:8.1f} {best/1e9:8.2f} {worst/1e9:9.2f} "
              f"{t_mxu*1e3:9.2f} {t_b*1e3:8.2f} / {t_w*1e3:6.2f} "
              f"{ceil:5.1f}-{ceil_w:4.1f}")
    flops, best, worst = tot
    t_mxu = flops / MXU_PEAK
    print(f"\nTOTAL  {flops/1e9:.1f} GFLOP  traffic {best/1e9:.2f}-"
          f"{worst/1e9:.2f} GB  t_mxu {t_mxu*1e3:.2f} ms  "
          f"t_bw {best/HBM_BW*1e3:.2f}-{worst/HBM_BW*1e3:.2f} ms")
    print(f"MFU ceiling: {flops/max(t_mxu, worst/HBM_BW)/MXU_PEAK*100:.1f}%"
          f" (concat materialized) .. "
          f"{flops/max(t_mxu, best/HBM_BW)/MXU_PEAK*100:.1f}% (ideal fusion)")
    print(f"equivalent TF/s ceiling: "
          f"{flops/max(t_mxu, worst/HBM_BW)/1e12:.1f}"
          f" .. {flops/max(t_mxu, best/HBM_BW)/1e12:.1f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
