"""Debug per-component parity between torch reference and flax backbone."""
import sys
import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/reference")

import torch
from models.dgcnn import DGCNN as TorchDGCNN
from models.attention import SelfAttention as TorchSelfAttention

import jax, jax.numpy as jnp
from r3dfsseg_tpu.nn.dgcnn import DGCNN as FlaxDGCNN, SelfAttention as FlaxAtt, BaseLearner as FlaxBase
from r3dfsseg_tpu.utils.torch_convert import convert_feature_extractor

EC = ((16, 16), (16, 16), (16, 16)); MLP = (32, 24); BASE = (16, 8); OUT = 8; K = 8; NPTS = 32; CIN = 9

torch.manual_seed(0)
gen = np.random.default_rng(1)

tenc = TorchDGCNN([list(w) for w in EC], list(MLP), CIN, k=K)
tatt = TorchSelfAttention(MLP[-1], OUT)


class TB(torch.nn.Module):
    def __init__(s):
        super().__init__()
        s.convs = torch.nn.ModuleList()
        for i, w in enumerate(BASE):
            ind = MLP[-1] if i == 0 else BASE[i-1]
            s.convs.append(torch.nn.Sequential(torch.nn.Conv1d(ind, w, 1), torch.nn.BatchNorm1d(w)))
    def forward(s, x):
        for i, c in enumerate(s.convs):
            x = c(x)
            if i != len(s.convs)-1:
                x = torch.nn.functional.relu(x)
        return x


tbase = TB()
for m in list(tenc.modules()) + list(tbase.modules()):
    if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
        with torch.no_grad():
            m.running_mean.copy_(torch.from_numpy(gen.normal(size=m.running_mean.shape).astype(np.float32))*0.2)
            m.running_var.copy_(torch.from_numpy(gen.uniform(0.5, 2., size=m.running_var.shape).astype(np.float32)))
tenc.eval(); tatt.eval(); tbase.eval()

sd = {}
for k, v in tenc.state_dict().items(): sd["encoder."+k] = v.numpy()
for k, v in tbase.state_dict().items(): sd["base_learner."+k] = v.numpy()
for k, v in tatt.state_dict().items(): sd["att_learner."+k] = v.numpy()

params, stats = convert_feature_extractor(sd, edgeconv_widths=EC, dgcnn_mlp_widths=MLP, base_widths=BASE, use_attention=True)

x = gen.normal(size=(2, NPTS, CIN)).astype(np.float32)
xt = torch.from_numpy(x.transpose(0, 2, 1))

with torch.no_grad():
    f1_t, f2_t = tenc(xt)
    f3_t = tbase(f2_t)
    att_t = tatt(f2_t)

fenc = FlaxDGCNN(EC, MLP, k=K)
v_enc = {"params": params["encoder"], "batch_stats": stats["encoder"]}
f1_j, f2_j = fenc.apply(v_enc, jnp.asarray(x), train=False)
print("enc level1 err:", np.abs(np.asarray(f1_j) - f1_t.numpy().transpose(0, 2, 1)).max())
print("enc level2 err:", np.abs(np.asarray(f2_j) - f2_t.numpy().transpose(0, 2, 1)).max())

fbase = FlaxBase(BASE)
v_base = {"params": params["base_learner"], "batch_stats": stats["base_learner"]}
f3_j = fbase.apply(v_base, f2_j, train=False)
print("base err:", np.abs(np.asarray(f3_j) - f3_t.numpy().transpose(0, 2, 1)).max())

fatt = FlaxAtt(OUT)
v_att = {"params": params["att_learner"]}
att_j = fatt.apply(v_att, jnp.asarray(f2_t.numpy().transpose(0, 2, 1)), train=False)
print("att err:", np.abs(np.asarray(att_j) - att_t.numpy().transpose(0, 2, 1)).max())

# --- localization analysis ---
err1 = np.abs(np.asarray(f1_j) - f1_t.numpy().transpose(0, 2, 1))
err2 = np.abs(np.asarray(f2_j) - f2_t.numpy().transpose(0, 2, 1))
print("level1: mean err", err1.mean(), "frac>1e-4:", (err1 > 1e-4).mean())
print("level2: mean err", err2.mean(), "frac>1e-4:", (err2 > 1e-4).mean())
# compare first-layer knn indices
from models.dgcnn import knn as torch_knn
from r3dfsseg_tpu.ops.knn import knn_indices
ti = torch_knn(xt, K).numpy()
ji = np.asarray(knn_indices(jnp.asarray(x), K))
same = 0; tot = 0
for b in range(2):
    for nn_ in range(NPTS):
        same += len(set(ti[b, nn_]) & set(ji[b, nn_])); tot += K
print("knn overlap:", same / tot)
