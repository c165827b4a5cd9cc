"""Dim-flexible torch mirrors of the reference models, with the
reference's EXACT state_dict key names (torchvision/timm naming for the
backbones, reference attribute names for the heads).

These stand in for the real reference models (torchvision/timm are not
in this image) so ``surya_tpu.models.full_import`` can be verified
end-to-end: build mirror → state_dict → import → flax logits == torch
logits. Architecture matches the reference exactly except that image /
sequence sizes are parameters (the reference hardcodes 224×224), and the
hierarchical mirror uses the corrected ``mid_w:`` slicing (the reference's
``w:`` zero-width-slice bug at ``Quadtree_from scratch/models.py:182,196``
would make Q4 empty and crash the conv; surya_tpu deliberately fixes it).
"""

from __future__ import annotations

import torch
import torch.nn as nn

# --------------------------------------------------------------------------
# torchvision-named backbones


class TVBasic(nn.Module):
    """torchvision resnet BasicBlock naming."""

    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU()
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + idt)


class TVResNet18(nn.Module):
    """torchvision-named resnet18 (conv1/bn1/relu/maxpool/layer1..4/
    avgpool/fc) so ``state_dict()`` keys match the real thing."""

    def __init__(self, num_classes=1000):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = nn.Sequential(TVBasic(64, 64), TVBasic(64, 64))
        self.layer2 = nn.Sequential(TVBasic(64, 128, 2),
                                    TVBasic(128, 128))
        self.layer3 = nn.Sequential(TVBasic(128, 256, 2),
                                    TVBasic(256, 256))
        self.layer4 = nn.Sequential(TVBasic(256, 512, 2),
                                    TVBasic(512, 512))
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(512, num_classes)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = layer(x)
        return self.fc(self.avgpool(x).flatten(1))


class TVBasic3D(nn.Module):
    """torchvision video BasicBlock naming: conv1/conv2 = Sequential(
    Conv3d, BN3d[, ReLU])."""

    def __init__(self, cin, cout, stride=1):
        super().__init__()
        s = (stride,) * 3
        self.conv1 = nn.Sequential(
            nn.Conv3d(cin, cout, 3, s, 1, bias=False),
            nn.BatchNorm3d(cout), nn.ReLU())
        self.conv2 = nn.Sequential(
            nn.Conv3d(cout, cout, 3, 1, 1, bias=False),
            nn.BatchNorm3d(cout))
        self.relu = nn.ReLU()
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv3d(cin, cout, 1, s, bias=False),
                nn.BatchNorm3d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.conv2(self.conv1(x))
        return self.relu(y + idt)


def tv_r3d18_parts():
    """(stem, layer1..4) with torchvision r3d_18 naming inside."""
    stem = nn.Sequential(
        nn.Conv3d(3, 64, (3, 7, 7), (1, 2, 2), (1, 3, 3), bias=False),
        nn.BatchNorm3d(64), nn.ReLU())
    mk = lambda cin, cout, s: nn.Sequential(TVBasic3D(cin, cout, s),
                                            TVBasic3D(cout, cout))
    return (stem, mk(64, 64, 1), mk(64, 128, 2), mk(128, 256, 2),
            mk(256, 512, 2))


class TimmBlock(nn.Module):
    """timm ViT block naming: norm1/attn.qkv/attn.proj/norm2/mlp.fc1/fc2."""

    def __init__(self, d, heads):
        super().__init__()
        self.d, self.heads = d, heads

        class Attn(nn.Module):
            def __init__(self):
                super().__init__()
                self.qkv = nn.Linear(d, 3 * d)
                self.proj = nn.Linear(d, d)

        class Mlp(nn.Module):
            def __init__(self):
                super().__init__()
                self.fc1 = nn.Linear(d, 4 * d)
                self.fc2 = nn.Linear(4 * d, d)

        self.norm1 = nn.LayerNorm(d)
        self.attn = Attn()
        self.norm2 = nn.LayerNorm(d)
        self.mlp = Mlp()

    def forward(self, x):
        b, n, d = x.shape
        h = self.heads
        y = self.norm1(x)
        qkv = self.attn.qkv(y).reshape(b, n, 3, h, d // h)
        q, k, v = qkv.unbind(2)
        q, k, v = (t.transpose(1, 2) for t in (q, k, v))
        att = (q @ k.transpose(-2, -1)) / (d // h) ** 0.5
        y = (att.softmax(dim=-1) @ v).transpose(1, 2).reshape(b, n, d)
        x = x + self.attn.proj(y)
        y = self.norm2(x)
        return x + self.mlp.fc2(nn.functional.gelu(self.mlp.fc1(y)))


class TimmViT(nn.Module):
    """timm vit naming; returns the final-LN CLS embedding."""

    def __init__(self, d=64, heads=4, depth=2, patch=8, img=16):
        super().__init__()

        class PatchEmbed(nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = nn.Conv2d(3, d, patch, patch)

        self.patch_embed = PatchEmbed()
        n = (img // patch) ** 2
        self.cls_token = nn.Parameter(torch.randn(1, 1, d))
        self.pos_embed = nn.Parameter(torch.randn(1, n + 1, d) * 0.02)
        self.blocks = nn.ModuleList(
            [TimmBlock(d, heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(d)

    def forward(self, x):
        b = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], dim=1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)[:, 0]


# --------------------------------------------------------------------------
# spatial mirrors


class MirrorQuadtree(nn.Module):
    """``Quadtree_from scratch/models.py:214-305`` (+ the mode switch of
    ``experiment/models_cnn.py:6-116``), dims derived from the input."""

    def __init__(self, num_classes=8, num_dim=47, dropout=0.5,
                 mode="fusion", img=224):
        super().__init__()
        self.mode = mode
        self.base_cnn = TVResNet18()
        self.quadrant_processor = nn.Sequential(
            nn.Conv2d(256, 128, 3, padding=1), nn.ReLU(),
            nn.MaxPool2d(2, 2))
        self.numerical_mlp = nn.Sequential(
            nn.Linear(num_dim, num_dim * 2), nn.ReLU(),
            nn.Dropout(dropout), nn.Linear(num_dim * 2, 256))
        side = img // 16 // 2 // 2          # layer3 map /2 quadrant /2 pool
        img_dim = 512 + 4 * 128 * side * side
        in_dim = {"fusion": img_dim + 256, "image_only": img_dim,
                  "numerical_only": 256}[mode]
        self.classifier = nn.Sequential(
            nn.Linear(in_dim, in_dim // 2), nn.ReLU(),
            nn.Dropout(dropout), nn.Linear(in_dim // 2, num_classes))

    def _extract(self, x):
        b = self.base_cnn
        x = b.maxpool(b.relu(b.bn1(b.conv1(x))))
        return b.layer3(b.layer2(b.layer1(x)))

    def forward(self, img, feats):
        fused = []
        if self.mode != "numerical_only":
            f = self._extract(img)
            h, w = f.shape[2] // 2, f.shape[3] // 2
            qs = [f[:, :, :h, :w], f[:, :, :h, w:],
                  f[:, :, h:, :w], f[:, :, h:, w:]]
            g = self.base_cnn.avgpool(self.base_cnn.layer4(f)).flatten(1)
            fused = [g] + [self.quadrant_processor(q).flatten(1)
                           for q in qs]
        if self.mode != "image_only":
            fused.append(self.numerical_mlp(feats))
        return self.classifier(torch.cat(fused, dim=1))


class _MirrorHierBase(nn.Module):
    def __init__(self):
        super().__init__()
        r = TVResNet18()
        self.features_extractor = nn.Sequential(
            r.conv1, r.bn1, r.relu, r.maxpool, r.layer1, r.layer2)
        self.global_processor = nn.Sequential(r.layer3, r.layer4,
                                              nn.AdaptiveAvgPool2d(1))
        self.quadrant_processor = nn.Sequential(
            nn.Conv2d(128, 128, 3, padding=1), nn.ReLU(),
            nn.AdaptiveAvgPool2d(1))
        self.sub_quadrant_processor = nn.Sequential(
            nn.Conv2d(128, 64, 3, padding=1), nn.ReLU(),
            nn.AdaptiveAvgPool2d(1))

    def levels(self, img):
        base = self.features_extractor(img)
        g = self.global_processor(base).flatten(1)
        h, w = base.shape[2] // 2, base.shape[3] // 2
        quads = [base[:, :, :h, :w], base[:, :, :h, w:],
                 base[:, :, h:, :w], base[:, :, h:, w:]]
        l1 = [self.quadrant_processor(q).flatten(1) for q in quads]
        l2 = []
        for q in quads:
            qh, qw = q.shape[2] // 2, q.shape[3] // 2
            subs = [q[:, :, :qh, :qw], q[:, :, :qh, qw:],
                    q[:, :, qh:, :qw], q[:, :, qh:, qw:]]
            l2 += [self.sub_quadrant_processor(s).flatten(1)
                   for s in subs]
        return g, l1, l2


class MirrorHierarchical(_MirrorHierBase):
    """``models.py:105-210`` with the Q4 slice bug fixed (see module
    docstring)."""

    def __init__(self, num_classes=8, num_dim=47, dropout=0.5):
        super().__init__()
        self.numerical_mlp = nn.Sequential(
            nn.Linear(num_dim, 128), nn.ReLU(), nn.Dropout(dropout))
        in_dim = 512 + 4 * 128 + 16 * 64 + 128
        self.classifier = nn.Sequential(
            nn.Linear(in_dim, 1024), nn.ReLU(), nn.Dropout(dropout),
            nn.Linear(1024, num_classes))

    def forward(self, img, feats):
        g, l1, l2 = self.levels(img)
        n = self.numerical_mlp(feats)
        return self.classifier(torch.cat([g] + l1 + l2 + [n], dim=1))


class MirrorAttentionHierarchical(_MirrorHierBase):
    """``models.py:6-101``."""

    def __init__(self, num_classes=8, num_dim=47, dropout=0.5):
        super().__init__()
        self.attention_gate = nn.Sequential(
            nn.Linear(64, 32), nn.ReLU(), nn.Linear(32, 1))
        self.numerical_mlp = nn.Sequential(
            nn.Linear(num_dim, 128), nn.ReLU(), nn.Dropout(dropout))
        in_dim = 512 + 4 * 128 + 64 + 128
        self.classifier = nn.Sequential(
            nn.Linear(in_dim, 1024), nn.ReLU(), nn.Dropout(dropout),
            nn.Linear(1024, num_classes))

    def forward(self, img, feats):
        g, l1, l2 = self.levels(img)
        stacked = torch.stack(l2, dim=1)                     # (B, 16, 64)
        scores = self.attention_gate(stacked).squeeze(-1)
        weights = torch.softmax(scores, dim=1).unsqueeze(-1)
        attended = torch.sum(stacked * weights, dim=1)
        n = self.numerical_mlp(feats)
        return self.classifier(torch.cat([g] + l1 + [attended, n], dim=1))


class MirrorStandardResNet(nn.Module):
    """``3dcnn/models.py:49-93``."""

    def __init__(self, num_classes=8, dropout=0.5):
        super().__init__()
        self.base_cnn = TVResNet18()
        self.classifier = nn.Sequential(
            nn.Linear(512, 256), nn.ReLU(), nn.Dropout(dropout),
            nn.Linear(256, num_classes))

    def forward(self, img, feats=None):
        b = self.base_cnn
        x = b.maxpool(b.relu(b.bn1(b.conv1(img))))
        x = b.layer4(b.layer3(b.layer2(b.layer1(x))))
        return self.classifier(b.avgpool(x).flatten(1))


class MirrorStandardMultimodal(nn.Module):
    """``comparative analysis/model.py:8-71`` (resnet18 backbone)."""

    def __init__(self, num_classes=8, num_dim=47, dropout=0.5):
        super().__init__()
        self.backbone = TVResNet18()
        self.backbone.fc = nn.Identity()
        self.numerical_mlp = nn.Sequential(
            nn.Linear(num_dim, num_dim * 2), nn.ReLU(),
            nn.Dropout(dropout), nn.Linear(num_dim * 2, 256))
        self.classifier = nn.Sequential(
            nn.Linear(512 + 256, 512), nn.ReLU(), nn.Dropout(dropout),
            nn.Linear(512, num_classes))

    def forward(self, img, feats):
        return self.classifier(torch.cat(
            [self.backbone(img), self.numerical_mlp(feats)], dim=1))


# --------------------------------------------------------------------------
# temporal mirrors


class MirrorCnnLstm(nn.Module):
    """``cnn+lstm/models.py:14-89``."""

    def __init__(self, num_classes=8, num_dim=47, dropout=0.5,
                 hidden=256):
        super().__init__()
        r = TVResNet18()
        self.cnn_backbone = nn.Sequential(
            r.conv1, r.bn1, r.relu, r.maxpool, r.layer1, r.layer2,
            r.layer3, r.layer4, r.avgpool)
        self.numerical_mlp = nn.Sequential(
            nn.Linear(num_dim, 128), nn.ReLU(), nn.Linear(128, 128))
        self.lstm = nn.LSTM(512 + 128, hidden, num_layers=2,
                            batch_first=True, dropout=dropout)
        self.classifier = nn.Sequential(
            nn.Linear(hidden, 128), nn.ReLU(), nn.Dropout(dropout),
            nn.Linear(128, num_classes))

    def forward(self, image_sequence, numerical_sequence):
        b, t = image_sequence.shape[:2]
        c = self.cnn_backbone(
            image_sequence.reshape((b * t,) + image_sequence.shape[2:]))
        c = c.reshape(b, t, -1)
        n = self.numerical_mlp(numerical_sequence)
        out, _ = self.lstm(torch.cat([c, n], dim=2))
        return self.classifier(out[:, -1, :])


def conv_3d_block(cin, cout):
    return nn.Sequential(nn.Conv3d(cin, cout, 3, 1, 1),
                         nn.BatchNorm3d(cout), nn.ReLU())


class MirrorJi3DCNN(nn.Module):
    """``cnn+lstm/models.py:93-142``."""

    def __init__(self, num_classes=8, num_dim=47, dropout=0.5):
        super().__init__()
        self.visual_stream = nn.Sequential(
            conv_3d_block(3, 32), nn.MaxPool3d((1, 2, 2)),
            conv_3d_block(32, 64), nn.MaxPool3d((2, 2, 2)),
            conv_3d_block(64, 128), nn.AdaptiveAvgPool3d(1))
        self.numerical_lstm = nn.LSTM(num_dim, 64, num_layers=1,
                                      batch_first=True)
        self.classifier = nn.Sequential(
            nn.Linear(128 + 64, 128), nn.ReLU(), nn.Dropout(dropout),
            nn.Linear(128, num_classes))

    def forward(self, image_sequence, numerical_sequence):
        v = self.visual_stream(
            image_sequence.permute(0, 2, 1, 3, 4)).flatten(1)
        out, _ = self.numerical_lstm(numerical_sequence)
        return self.classifier(torch.cat([v, out[:, -1, :]], dim=1))


class MirrorQuadtree3D(nn.Module):
    """``3dcnn/models.py:96-214``."""

    def __init__(self, num_classes=8, num_dim=47, dropout=0.6,
                 mode="fusion", feature_dim=1024):
        super().__init__()
        self.mode = mode

        def block(cin, cout, pool):
            return nn.Sequential(
                nn.Conv3d(cin, cout, 3, 1, 1), nn.BatchNorm3d(cout),
                nn.ReLU(), nn.MaxPool3d(pool, pool))

        self.conv3d_block1 = block(3, 32, (1, 2, 2))
        self.conv3d_block2 = block(32, 64, (2, 2, 2))
        self.conv3d_block3 = block(64, 128, (2, 2, 2))
        self.conv3d_block4_new = block(128, 256, (1, 2, 2))
        self.conv3d_final_features = nn.Sequential(
            nn.Conv3d(256, feature_dim, 3, 1, 1),
            nn.BatchNorm3d(feature_dim), nn.ReLU())
        self.global_avg_pool_3d = nn.AdaptiveAvgPool3d(1)
        if mode == "fusion":
            self.numerical_lstm = nn.LSTM(num_dim, num_dim * 4,
                                          num_layers=2, batch_first=True,
                                          dropout=dropout)
            self.numerical_projection = nn.Sequential(
                nn.Linear(num_dim * 4, feature_dim // 2), nn.ReLU(),
                nn.Dropout(dropout))
        in_dim = feature_dim + (feature_dim // 2 if mode == "fusion"
                                else 0)
        self.classifier = nn.Sequential(
            nn.Linear(in_dim, in_dim // 2), nn.ReLU(),
            nn.Dropout(dropout), nn.Linear(in_dim // 2, num_classes))

    def forward(self, image_sequence, numerical_sequence):
        x = image_sequence.permute(0, 2, 1, 3, 4)
        for blk in (self.conv3d_block1, self.conv3d_block2,
                    self.conv3d_block3, self.conv3d_block4_new,
                    self.conv3d_final_features):
            x = blk(x)
        img = self.global_avg_pool_3d(x).flatten(1)
        if self.mode == "fusion":
            out, _ = self.numerical_lstm(numerical_sequence)
            n = self.numerical_projection(out[:, -1, :])
            img = torch.cat([img, n], dim=1)
        return self.classifier(img)


class _R3DModel(nn.Module):
    """torchvision r3d_18 naming (stem/layer1..4/avgpool/fc)."""

    def __init__(self, fc):
        super().__init__()
        (self.stem, self.layer1, self.layer2, self.layer3,
         self.layer4) = tv_r3d18_parts()
        self.avgpool = nn.AdaptiveAvgPool3d(1)
        self.fc = fc

    def forward(self, x):
        x = self.stem(x)
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = layer(x)
        return self.fc(self.avgpool(x).flatten(1))


class MirrorResNet3DVideo(nn.Module):
    """``3dcnn/models.py:220-259``."""

    def __init__(self, num_classes=8, dropout=0.5):
        super().__init__()
        self.r3d_model = _R3DModel(nn.Sequential(
            nn.Linear(512, 256), nn.ReLU(), nn.Dropout(dropout),
            nn.Linear(256, num_classes)))

    def forward(self, image_sequence, numerical_sequence=None):
        return self.r3d_model(image_sequence.permute(0, 2, 1, 3, 4))


class MirrorHybridQuadtree3D(nn.Module):
    """``3dcnn/models.py:265-375``."""

    def __init__(self, num_classes=8, num_dim=47, dropout=0.6,
                 mode="fusion"):
        super().__init__()
        self.mode = mode
        self.pretrained_image_extractor = nn.Sequential(
            *tv_r3d18_parts())
        self.global_avg_pool_3d = nn.AdaptiveAvgPool3d(1)
        if mode == "fusion":
            self.numerical_lstm = nn.LSTM(num_dim, num_dim * 4,
                                          num_layers=2, batch_first=True,
                                          dropout=dropout)
            self.numerical_projection = nn.Sequential(
                nn.Linear(num_dim * 4, 256), nn.ReLU(),
                nn.Dropout(dropout))
        in_dim = 512 + (256 if mode == "fusion" else 0)
        self.classifier = nn.Sequential(
            nn.Linear(in_dim, in_dim // 2), nn.ReLU(),
            nn.Dropout(dropout), nn.Linear(in_dim // 2, num_classes))

    def forward(self, image_sequence, numerical_sequence):
        x = self.pretrained_image_extractor(
            image_sequence.permute(0, 2, 1, 3, 4))
        img = self.global_avg_pool_3d(x).flatten(1)
        if self.mode == "fusion":
            out, _ = self.numerical_lstm(numerical_sequence)
            n = self.numerical_projection(out[:, -1, :])
            img = torch.cat([img, n], dim=1)
        return self.classifier(img)


class MirrorFact(nn.Module):
    """``VIT/fact_model.py:7-147`` with a small timm-named ViT."""

    def __init__(self, num_classes=8, num_dim=47, seq_len=2, d=64,
                 heads=4, layers=2, vit_depth=2, patch=8, img=16,
                 dropout=0.1):
        super().__init__()
        self.seq_len = seq_len
        self.embed_dim = d
        self.img = img
        self.vit_backbone = TimmViT(d=d, heads=heads, depth=vit_depth,
                                    patch=patch, img=img)
        self.numerical_projector = nn.Sequential(
            nn.Linear(num_dim, d // 2), nn.ReLU(), nn.Linear(d // 2, d))
        layer = nn.TransformerEncoderLayer(
            d_model=d, nhead=heads, dim_feedforward=d * 4,
            dropout=dropout, activation="relu", batch_first=True)
        self.fusion_transformer = nn.TransformerEncoder(layer,
                                                        num_layers=layers)
        self.cls_token = nn.Parameter(torch.randn(1, 1, d))
        self.pos_embed = nn.Parameter(
            torch.randn(1, seq_len * 2 + 1, d))
        self.token_type_embed = nn.Embedding(2, d)
        self.classification_head = nn.Sequential(
            nn.LayerNorm(d), nn.Linear(d, num_classes))

    def forward(self, image_sequence, numerical_sequence):
        b, t = image_sequence.shape[:2]
        frames = image_sequence.reshape(b * t, 3, self.img, self.img)
        img_tok = self.vit_backbone(frames).reshape(b, t, self.embed_dim)
        num_tok = self.numerical_projector(numerical_sequence)
        zero = torch.zeros(1, 1, dtype=torch.long)
        one = torch.ones(1, 1, dtype=torch.long)
        img_tok = img_tok + self.token_type_embed(zero)
        num_tok = num_tok + self.token_type_embed(one)
        fused = torch.stack([img_tok, num_tok], dim=2).reshape(
            b, 2 * t, self.embed_dim)
        cls = self.cls_token.expand(b, -1, -1)
        full = torch.cat([cls, fused], dim=1) + self.pos_embed
        out = self.fusion_transformer(full)
        return self.classification_head(out[:, 0])


def randomize_bn_stats(model, seed=0):
    """Make eval-mode BN non-trivial so equivalence tests are strict."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (nn.BatchNorm2d, nn.BatchNorm3d)):
                m.running_mean.uniform_(-0.5, 0.5, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)


# --------------------------------------------------------------------------
# U²-Net (xuebinqin/U-2-Net naming, as rembg's onnx models were built
# from; ref background stage: Background_remove/batch_remove_background
# .py:114). Small variant only — the full one is the same code with
# bigger channel specs.


class U2REBNCONV(nn.Module):
    def __init__(self, cin, cout, dirate=1):
        super().__init__()
        self.conv_s1 = nn.Conv2d(cin, cout, 3, padding=dirate,
                                 dilation=dirate)
        self.bn_s1 = nn.BatchNorm2d(cout)

    def forward(self, x):
        return torch.relu(self.bn_s1(self.conv_s1(x)))


def _u2_upsample_like(src, tar):
    return nn.functional.interpolate(src, size=tar.shape[2:],
                                     mode="bilinear")


class U2RSU(nn.Module):
    def __init__(self, height, cin, mid, cout):
        super().__init__()
        self.height = height
        self.rebnconvin = U2REBNCONV(cin, cout)
        self.pool = nn.MaxPool2d(2, stride=2, ceil_mode=True)
        setattr(self, "rebnconv1", U2REBNCONV(cout, mid))
        for i in range(2, height):
            setattr(self, f"rebnconv{i}", U2REBNCONV(mid, mid))
        setattr(self, f"rebnconv{height}", U2REBNCONV(mid, mid, dirate=2))
        for i in range(height - 1, 1, -1):
            setattr(self, f"rebnconv{i}d", U2REBNCONV(mid * 2, mid))
        self.rebnconv1d = U2REBNCONV(mid * 2, cout)

    def forward(self, x):
        hxin = self.rebnconvin(x)
        enc = [self.rebnconv1(hxin)]
        hx = enc[0]
        for i in range(2, self.height):
            hx = getattr(self, f"rebnconv{i}")(self.pool(hx))
            enc.append(hx)
        hx = getattr(self, f"rebnconv{self.height}")(enc[-1])
        for i in range(self.height - 1, 1, -1):
            hx = getattr(self, f"rebnconv{i}d")(
                torch.cat((hx, enc[i - 1]), 1))
            hx = _u2_upsample_like(hx, enc[i - 2])
        hx1d = self.rebnconv1d(torch.cat((hx, enc[0]), 1))
        return hxin + hx1d


class U2RSU4F(nn.Module):
    def __init__(self, cin, mid, cout):
        super().__init__()
        self.rebnconvin = U2REBNCONV(cin, cout)
        self.rebnconv1 = U2REBNCONV(cout, mid, dirate=1)
        self.rebnconv2 = U2REBNCONV(mid, mid, dirate=2)
        self.rebnconv3 = U2REBNCONV(mid, mid, dirate=4)
        self.rebnconv4 = U2REBNCONV(mid, mid, dirate=8)
        self.rebnconv3d = U2REBNCONV(mid * 2, mid, dirate=4)
        self.rebnconv2d = U2REBNCONV(mid * 2, mid, dirate=2)
        self.rebnconv1d = U2REBNCONV(mid * 2, cout, dirate=1)

    def forward(self, x):
        hxin = self.rebnconvin(x)
        hx1 = self.rebnconv1(hxin)
        hx2 = self.rebnconv2(hx1)
        hx3 = self.rebnconv3(hx2)
        hx4 = self.rebnconv4(hx3)
        hx3d = self.rebnconv3d(torch.cat((hx4, hx3), 1))
        hx2d = self.rebnconv2d(torch.cat((hx3d, hx2), 1))
        hx1d = self.rebnconv1d(torch.cat((hx2d, hx1), 1))
        return hxin + hx1d


class _MirrorU2NetBase(nn.Module):
    def forward(self, x):
        hx1 = self.stage1(x)
        hx2 = self.stage2(self.pool(hx1))
        hx3 = self.stage3(self.pool(hx2))
        hx4 = self.stage4(self.pool(hx3))
        hx5 = self.stage5(self.pool(hx4))
        hx6 = self.stage6(self.pool(hx5))
        hx6up = _u2_upsample_like(hx6, hx5)
        hx5d = self.stage5d(torch.cat((hx6up, hx5), 1))
        hx4d = self.stage4d(
            torch.cat((_u2_upsample_like(hx5d, hx4), hx4), 1))
        hx3d = self.stage3d(
            torch.cat((_u2_upsample_like(hx4d, hx3), hx3), 1))
        hx2d = self.stage2d(
            torch.cat((_u2_upsample_like(hx3d, hx2), hx2), 1))
        hx1d = self.stage1d(
            torch.cat((_u2_upsample_like(hx2d, hx1), hx1), 1))
        d1 = self.side1(hx1d)
        d2 = _u2_upsample_like(self.side2(hx2d), d1)
        d3 = _u2_upsample_like(self.side3(hx3d), d1)
        d4 = _u2_upsample_like(self.side4(hx4d), d1)
        d5 = _u2_upsample_like(self.side5(hx5d), d1)
        d6 = _u2_upsample_like(self.side6(hx6), d1)
        d0 = self.outconv(torch.cat((d1, d2, d3, d4, d5, d6), 1))
        return [torch.sigmoid(d) for d in (d0, d1, d2, d3, d4, d5, d6)]


class MirrorU2NetP(_MirrorU2NetBase):
    """U2NETP: every stage mid=16 out=64."""

    def __init__(self):
        super().__init__()
        self.stage1 = U2RSU(7, 3, 16, 64)
        self.stage2 = U2RSU(6, 64, 16, 64)
        self.stage3 = U2RSU(5, 64, 16, 64)
        self.stage4 = U2RSU(4, 64, 16, 64)
        self.stage5 = U2RSU4F(64, 16, 64)
        self.stage6 = U2RSU4F(64, 16, 64)
        self.pool = nn.MaxPool2d(2, stride=2, ceil_mode=True)
        self.stage5d = U2RSU4F(128, 16, 64)
        self.stage4d = U2RSU(4, 128, 16, 64)
        self.stage3d = U2RSU(5, 128, 16, 64)
        self.stage2d = U2RSU(6, 128, 16, 64)
        self.stage1d = U2RSU(7, 128, 16, 64)
        for i in range(1, 7):
            setattr(self, f"side{i}", nn.Conv2d(64, 1, 3, padding=1))
        self.outconv = nn.Conv2d(6, 1, 1)


class MirrorU2Net(_MirrorU2NetBase):
    """Full U2NET channel spec (the 'u2net' onnx rembg defaults to)."""

    def __init__(self):
        super().__init__()
        self.stage1 = U2RSU(7, 3, 32, 64)
        self.stage2 = U2RSU(6, 64, 32, 128)
        self.stage3 = U2RSU(5, 128, 64, 256)
        self.stage4 = U2RSU(4, 256, 128, 512)
        self.stage5 = U2RSU4F(512, 256, 512)
        self.stage6 = U2RSU4F(512, 256, 512)
        self.pool = nn.MaxPool2d(2, stride=2, ceil_mode=True)
        self.stage5d = U2RSU4F(1024, 256, 512)
        self.stage4d = U2RSU(4, 1024, 128, 256)
        self.stage3d = U2RSU(5, 512, 64, 128)
        self.stage2d = U2RSU(6, 256, 32, 64)
        self.stage1d = U2RSU(7, 128, 16, 64)
        for i, c in zip(range(1, 7), (64, 64, 128, 256, 512, 512)):
            setattr(self, f"side{i}", nn.Conv2d(c, 1, 3, padding=1))
        self.outconv = nn.Conv2d(6, 1, 1)
