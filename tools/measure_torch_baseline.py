"""Measure the reference's torch train-step on this host CPU (documented
baseline provenance for bench.py; the reference's GPUs are unavailable)."""
import sys, time
sys.path.insert(0, "/root/reference")
import torch
torch.cuda.FloatTensor = torch.FloatTensor  # CPU shim used by VAE.forward
import joint_model as jm

seg = jm.Segmentation(n_channels=1, n_class=2, norm_type=1)
vae = jm.VAE(n_channels=2, n_class=2, norm_type=1, dim=128)
model = jm.Joint(models=[seg, vae])
for p in model.Vae.parameters():
    p.requires_grad = False
opt = torch.optim.SGD([p for p in model.parameters() if p.requires_grad], lr=1e-3, momentum=0.9)

B, S = 4, 128
img = torch.randn(B, 1, S, S, S)
pseudo = (torch.rand(B, 2, S, S, S) > 0.5).float()

def step():
    d = {"x": img}
    d = model(d, "x", "pred", "recon")
    pred, recon = d["pred"], d["recon"]
    inter = (pred*recon).sum((2,3,4)); den = pred.sum((2,3,4))+recon.sum((2,3,4))
    recon_loss = 1 - (2*inter/(den+1e-6))[:,1:].mean()
    interf = (pred*pseudo).sum((2,3,4)); denf = pred.sum((2,3,4))+pseudo.sum((2,3,4))
    fake_loss = 1 - (2*interf/(denf+1e-6))[:,1:].mean()
    loss = recon_loss + fake_loss
    opt.zero_grad(); loss.backward(); opt.step()
    return float(loss)

t0=time.time(); step(); print("step1", time.time()-t0, flush=True)
t0=time.time(); n=2
for _ in range(n): step()
print("torch_cpu_sec_per_step", (time.time()-t0)/n, flush=True)
