"""Analytic roofline for the flagship adaptation step (BENCH.md §roofline).

Enumerates every conv stage of the SegUNet + ShapeVAE at the bench config
(128^3, global batch 4) and derives:
  * logical FLOPs (the math the reference model defines);
  * executed FLOPs on the production rep (space-to-depth folding trades a
    dense-lane layout for an 8x FLOP inflation on folded stages, x2 more
    for the W-packed 128-lane format — ops/s2d.py);
  * activation HBM bytes (bf16, read input + write output per conv).

Step composition: teacher Seg forward + student (Seg+VAE) forward +
backward (dx + dk per conv ~= 2x forward FLOPs), losses/norms excluded
(bandwidth-bound, counted in bytes only roughly). Peaks: v5e 197 TFLOP/s
bf16, 819 GB/s HBM.

Run: python tools/probes/roofline.py   (pure python, no jax)
"""

FMAPS = (8, 16, 32, 64, 128, 256)
S, B, NCLS = 128, 4, 2
PEAK_F, PEAK_B = 197e12, 819e9


def conv_flops(res, cin, cout, k=27):
    return 2 * k * cin * cout * (res ** 3) * B


def net_stages(n_in, n_stages, decoder_to_full=True):
    """[(name, res, cin, cout, kind)] for one U-Net-ish trunk."""
    f = FMAPS
    st = [("in", S, n_in, f[0], "conv3")]
    res = S
    for i in range(1, n_stages):
        st.append((f"down{i}.entry", res // 2, f[i - 1], f[i - 1], "conv8"))
        res //= 2
        st.append((f"down{i}.dc1", res, f[i - 1], f[i], "conv3"))
        st.append((f"down{i}.dc2", res, f[i], f[i], "conv3"))
        st.append((f"down{i}.dc3", res, f[i], f[i], "conv3"))
    for i in range(n_stages - 1, 0, -1):
        st.append((f"up{i}.tconv", res * 2, f[i], f[i], "conv8"))
        res *= 2
        st.append((f"up{i}.dc1", res, f[i], f[i - 1], "conv3"))
        st.append((f"up{i}.dc2", res, f[i - 1], f[i - 1], "conv3"))
        st.append((f"up{i}.dc3", res, f[i - 1], f[i - 1], "conv3"))
    st.append(("out", S, f[0], NCLS, "conv3"))
    return st


def analyze(stages):
    rows = []
    for name, res, cin, cout, kind in stages:
        k = 27 if kind == "conv3" else 8
        fl = conv_flops(res, cin, cout, k)
        # production rep: 128^3-logical 3^3 convs run folded (8x) and
        # W-packed (2x more); 64^3-logical folded stages 8x; rest 1x
        if kind == "conv3" and res == S:
            infl = 16
        elif kind == "conv3" and res == S // 2 and max(cin, cout) <= FMAPS[1]:
            infl = 8
        else:
            infl = 1
        byt = 2 * B * res ** 3 * (cin + cout)  # bf16 in+out
        rows.append((name, res, cin, cout, fl, fl * infl, byt))
    return rows


seg = analyze(net_stages(1, 5))
vae_enc = analyze(net_stages(NCLS, 6))[:len(net_stages(NCLS, 6)) // 2 + 1]
# VAE: encoder stages = in + 5 downs; decoder = 5 ups + out (build exactly)
vae = analyze(net_stages(NCLS, 6))

sum_l = lambda rows: sum(r[4] for r in rows)  # noqa: E731
sum_x = lambda rows: sum(r[5] for r in rows)  # noqa: E731
sum_b = lambda rows: sum(r[6] for r in rows)  # noqa: E731

print(f"{'stage':14s} {'res':>4s} {'cin':>4s} {'cout':>4s} "
      f"{'GFLOP(log)':>11s} {'GFLOP(exec)':>12s} {'MB':>7s}")
for name, res, cin, cout, fl, fx, byt in seg:
    print(f"Seg.{name:10s} {res:4d} {cin:4d} {cout:4d} {fl/1e9:11.1f} "
          f"{fx/1e9:12.1f} {byt/1e6:7.1f}")
print(f"Seg total: logical {sum_l(seg)/1e9:.0f} GFLOP, executed "
      f"{sum_x(seg)/1e9:.0f} GFLOP, {sum_b(seg)/1e9:.2f} GB activations")
print(f"VAE total: logical {sum_l(vae)/1e9:.0f} GFLOP, executed "
      f"{sum_x(vae)/1e9:.0f} GFLOP, {sum_b(vae)/1e9:.2f} GB activations")

# the grouped-tap stencil kernels (stencil3.py) cut the folded-stage MXU
# passes 27 -> 8 wherever the folded lane count reaches 128 (everything
# except the two narrow entry convs per network)
def grouped_x(rows):
    out = 0.0
    for name, res, cin, cout, fl, fx, byt in rows:
        eff = fx
        lanes_in = cin * 8 * (2 if res == S else 1)  # folded (+W-packed)
        if fx > fl and lanes_in >= 128:
            eff = fx * 8 / 27
        out += eff
    return out


# step composition: teacher Seg fwd + student (Seg + VAE) fwd
# + backward dx+dk (~2x fwd) for the student networks
fwd_x = sum_x(seg) + sum_x(vae)
step_x = sum_x(seg) + fwd_x + 2 * fwd_x
fwd_g = grouped_x(seg) + grouped_x(vae)
step_g = grouped_x(seg) + 3 * fwd_g
step_l = sum_l(seg) + 3 * (sum_l(seg) + sum_l(vae))
step_b = sum_b(seg) + 3 * (sum_b(seg) + sum_b(vae))
print(f"\nadapt step: logical {step_l/1e12:.2f} TFLOP, executed "
      f"{step_x/1e12:.2f} TFLOP dense-folded / {step_g/1e12:.2f} TFLOP "
      f"grouped-tap, ~{step_b/1e9:.1f} GB conv activations")
print(f"compute floor (grouped @ {PEAK_F/1e12:.0f} TFLOP/s): "
      f"{step_g/PEAK_F*1e3:.1f} ms")
print(f"bandwidth floor (conv act @ {PEAK_B/1e9:.0f} GB/s): "
      f"{step_b/PEAK_B*1e3:.1f} ms")
for sps in (1.38, 2.03, 5.16, 7.38):
    ms = 1e3 / sps
    print(f"at {sps:5.2f} steps/s ({ms:5.0f} ms): MXU-equivalent "
          f"{step_g/(ms/1e3)/PEAK_F*100:5.1f}% of bf16 peak on grouped "
          f"FLOPs (logical: {step_l/(ms/1e3)/PEAK_F*100:4.1f}%)")
