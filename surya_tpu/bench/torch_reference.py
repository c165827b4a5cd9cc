"""Measure the PyTorch reference's training throughput (baseline step 1).

The reference publishes no throughput numbers (BASELINE.md), so we measure
an architecturally-equivalent torch QuadtreeCNN (resnet18 trunk → layer3
quadrant split → shared quadrant conv → layer4 global branch → numeric MLP
→ fusion classifier, dims per ``Quadtree_from scratch/models.py:214-305``)
doing full forward+backward+Adam steps, on whatever torch device is
available here (CPU in this environment; the reference itself ran on an
unspecified single GPU). Results land in ``benchmarks/torch_baseline.json``
and feed ``bench.py``'s ``vs_baseline``.

Run: python -m surya_tpu.bench.torch_reference
"""

from __future__ import annotations

import json
import os
import time


def _torch_resnet18_stages():
    """Minimal torch ResNet-18 stages (torchvision is not in this image)."""
    import torch.nn as nn

    class Basic(nn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.c1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.b1 = nn.BatchNorm2d(cout)
            self.c2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.b2 = nn.BatchNorm2d(cout)
            self.relu = nn.ReLU(inplace=True)
            self.down = None
            if stride != 1 or cin != cout:
                self.down = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False),
                    nn.BatchNorm2d(cout))

        def forward(self, x):
            idt = x if self.down is None else self.down(x)
            y = self.relu(self.b1(self.c1(x)))
            y = self.b2(self.c2(y))
            return self.relu(y + idt)

    def layer(cin, cout, stride):
        return nn.Sequential(Basic(cin, cout, stride), Basic(cout, cout))

    stem = nn.Sequential(nn.Conv2d(3, 64, 7, 2, 3, bias=False),
                         nn.BatchNorm2d(64), nn.ReLU(inplace=True),
                         nn.MaxPool2d(3, 2, 1))
    return (stem, layer(64, 64, 1), layer(64, 128, 2),
            layer(128, 256, 2), layer(256, 512, 2))


def build_torch_quadtree(num_classes: int = 8):
    import torch
    import torch.nn as nn

    class TorchQuadtree(nn.Module):
        def __init__(self):
            super().__init__()
            stem, l1, l2, l3, l4 = _torch_resnet18_stages()
            self.extract = nn.Sequential(stem, l1, l2, l3)
            self.global_branch = nn.Sequential(l4,
                                               nn.AdaptiveAvgPool2d(1))
            self.quad = nn.Sequential(
                nn.Conv2d(256, 128, 3, padding=1), nn.ReLU(),
                nn.MaxPool2d(2))
            self.num_mlp = nn.Sequential(
                nn.Linear(47, 94), nn.ReLU(), nn.Dropout(0.3),
                nn.Linear(94, 256), nn.ReLU())
            self.classifier = nn.Sequential(
                nn.Linear(5376, 2688), nn.ReLU(), nn.Dropout(0.5),
                nn.Linear(2688, num_classes))

        def forward(self, img, feats):
            f = self.extract(img)
            h, w = f.shape[2] // 2, f.shape[3] // 2
            qs = [f[:, :, :h, :w], f[:, :, :h, w:],
                  f[:, :, h:, :w], f[:, :, h:, w:]]
            qf = [self.quad(q).flatten(1) for q in qs]
            g = self.global_branch(f).flatten(1)
            nf = self.num_mlp(feats)
            return self.classifier(torch.cat([g] + qf + [nf], dim=1))

    return TorchQuadtree()


def measure(batch_size: int = 16, steps: int = 10, warmup: int = 3) -> dict:
    import torch

    torch.manual_seed(0)
    device = "cuda" if torch.cuda.is_available() else "cpu"
    model = build_torch_quadtree().to(device).train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-4, weight_decay=1e-4)
    loss_fn = torch.nn.CrossEntropyLoss()
    img = torch.randn(batch_size, 3, 224, 224, device=device)
    feats = torch.randn(batch_size, 47, device=device)
    labels = torch.randint(0, 8, (batch_size,), device=device)

    def one_step():
        opt.zero_grad()
        loss = loss_fn(model(img, feats), labels)
        loss.backward()
        opt.step()

    for _ in range(warmup):
        one_step()
    if device == "cuda":
        torch.cuda.synchronize()
    t0 = time.perf_counter()
    for _ in range(steps):
        one_step()
    if device == "cuda":
        torch.cuda.synchronize()
    dt = time.perf_counter() - t0
    return {
        "metric": "train_images_per_sec",
        "value": batch_size * steps / dt,
        "batch_size": batch_size,
        "device": device,
        "torch_version": torch.__version__,
        "note": ("architecturally-equivalent torch QuadtreeCNN, "
                 "fwd+bwd+Adam, randomly-initialized weights"),
    }


if __name__ == "__main__":
    result = measure()
    os.makedirs("benchmarks", exist_ok=True)
    with open("benchmarks/torch_baseline.json", "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
