"""FLOP-equivalent PyTorch CPU model of the reference architecture, used ONLY
to measure the CPU baseline for bench.py.

The actual reference cannot run in this environment (it imports torchvision,
which is not installed), so this module rebuilds the exact same topology in
plain torch: ResNet-18 trunk truncated at layer3 + 1x1 proj
(ref: encoders.py:102-120), PointNet (encoders.py:252-298), 5x shared radar
PointNet + concat fuse (encoders.py:560-661), pseudo-BEV fusion
(fusion.py:46-327), CenterNet head (fusion.py:788-884), and maxpool-NMS +
top-K decode (centernet_target.py:326-452). Parameter counts match the JAX
model (~55M tri-modal).
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


def _conv_bn_relu(cin, cout, k):
    return nn.Sequential(
        nn.Conv2d(cin, cout, k, padding=k // 2),
        nn.BatchNorm2d(cout),
        nn.ReLU(inplace=True),
    )


class _BasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.down = None
        if stride != 1 or cin != cout:
            self.down = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout),
            )

    def forward(self, x):
        idt = x if self.down is None else self.down(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + idt)


class TorchReferenceDetector(nn.Module):
    """Tri-modal reference-equivalent forward for CPU baseline timing."""

    def __init__(self, bev=50, num_classes=10):
        super().__init__()
        self.bev = bev
        # ResNet-18 trunk through layer3 (stride 16)
        self.stem = nn.Sequential(
            nn.Conv2d(3, 64, 7, 2, 3, bias=False),
            nn.BatchNorm2d(64),
            nn.ReLU(inplace=True),
            nn.MaxPool2d(3, 2, 1),
        )
        self.layer1 = nn.Sequential(_BasicBlock(64, 64), _BasicBlock(64, 64))
        self.layer2 = nn.Sequential(
            _BasicBlock(64, 128, 2), _BasicBlock(128, 128)
        )
        self.layer3 = nn.Sequential(
            _BasicBlock(128, 256, 2), _BasicBlock(256, 256)
        )
        self.channel_proj = nn.Sequential(
            nn.Conv2d(256, 512, 1, bias=False),
            nn.BatchNorm2d(512),
            nn.ReLU(inplace=True),
        )
        # PointNet LiDAR
        widths = [4, 64, 128, 256, 512, 1024]
        self.pointnet = nn.ModuleList(
            [
                nn.Sequential(
                    nn.Conv1d(widths[i], widths[i + 1], 1),
                    nn.BatchNorm1d(widths[i + 1]),
                    nn.ReLU(inplace=True),
                )
                for i in range(5)
            ]
        )
        # Radar PointNet (shared) + concat fuse
        rw = [7, 32, 64, 128, 256]
        self.radarnet = nn.ModuleList(
            [
                nn.Sequential(
                    nn.Conv1d(rw[i], rw[i + 1], 1),
                    nn.BatchNorm1d(rw[i + 1]),
                    nn.ReLU(inplace=True),
                )
                for i in range(4)
            ]
        )
        self.radar_fuse = nn.Linear(256 * 5, 256)
        # BEV fusion
        self.camera_proj = nn.Sequential(
            _conv_bn_relu(512, 512, 3), _conv_bn_relu(512, 256, 1)
        )
        self.lidar_init = nn.Sequential(
            nn.Linear(1024, 512), nn.ReLU(inplace=True),
            nn.Linear(512, 128 * 25 * 25),
        )
        self.lidar_up = nn.Sequential(
            _conv_bn_relu(128, 128, 3),
            nn.Upsample(scale_factor=2, mode="bilinear", align_corners=False),
            _conv_bn_relu(128, 256, 3),
        )
        self.radar_proj = nn.Sequential(
            nn.Linear(256, 256), nn.ReLU(inplace=True)
        )
        self.radar_refine = nn.Sequential(
            _conv_bn_relu(256, 256, 3), _conv_bn_relu(256, 256, 3)
        )
        self.bev_fusion = nn.Sequential(
            _conv_bn_relu(256 * 3, 512, 3), _conv_bn_relu(512, 256, 3)
        )
        # CenterNet head
        def branch(out):
            return nn.Sequential(
                nn.Conv2d(256, 64, 3, padding=1),
                nn.ReLU(inplace=True),
                nn.Conv2d(64, out, 1),
            )

        self.hm = branch(num_classes)
        self.off = branch(2)
        self.size = branch(3)
        self.rot = branch(2)
        self.vel = branch(2)

    def forward(self, cams, lidar, radars):
        b, n = cams.shape[:2]
        x = cams.reshape(b * n, *cams.shape[2:])
        x = self.stem(x)
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        x = self.channel_proj(x)
        x = x.reshape(b, n, *x.shape[1:]).mean(dim=1)
        cam_bev = self.camera_proj(x)
        cam_bev = F.interpolate(
            cam_bev, size=(self.bev, self.bev), mode="bilinear",
            align_corners=False,
        )

        y = lidar.transpose(1, 2)
        for layer in self.pointnet:
            y = layer(y)
        lid_feat = y.max(dim=2)[0]
        lid_bev = self.lidar_init(lid_feat).reshape(b, 128, 25, 25)
        lid_bev = self.lidar_up(lid_bev)
        lid_bev = F.interpolate(
            lid_bev, size=(self.bev, self.bev), mode="bilinear",
            align_corners=False,
        )

        feats = []
        for r in range(radars.shape[1]):
            z = radars[:, r].transpose(1, 2)
            for layer in self.radarnet:
                z = layer(z)
            feats.append(z.max(dim=2)[0])
        rad_feat = self.radar_fuse(torch.cat(feats, dim=1))
        rad_bev = self.radar_proj(rad_feat)[:, :, None, None].expand(
            b, 256, self.bev, self.bev
        )
        rad_bev = self.radar_refine(rad_bev)

        fused = self.bev_fusion(torch.cat([cam_bev, lid_bev, rad_bev], 1))
        return {
            "heatmap": torch.sigmoid(self.hm(fused)),
            "offset": self.off(fused),
            "size": self.size(fused),
            "rot": self.rot(fused),
            "vel": self.vel(fused),
        }


@torch.no_grad()
def decode_torch(preds, k=100):
    hm = preds["heatmap"]
    b, c, h, w = hm.shape
    hmax = F.max_pool2d(hm, 3, stride=1, padding=1)
    heat = hm * (hmax == hm).float()
    flat = heat.reshape(b, c, -1)
    scores1, idx1 = torch.topk(flat, k, dim=2)
    scores, idx2 = torch.topk(scores1.reshape(b, -1), k, dim=1)
    ys = torch.gather((idx1 // w).reshape(b, -1), 1, idx2)
    xs = torch.gather((idx1 % w).reshape(b, -1), 1, idx2)
    return scores, ys, xs


@torch.no_grad()
def measure_cpu_baseline(
    image_size=(448, 800), n_lidar=35000, n_radar=125, iters=2
) -> float:
    """Samples/sec of the reference-equivalent tri-modal forward + decode on
    CPU (batch 1, eval mode, inference.device='cpu' per configs/base.yaml:550)."""
    import time

    torch.manual_seed(0)
    model = TorchReferenceDetector().eval()
    h, w = image_size
    cams = torch.randn(1, 6, 3, h, w)
    lidar = torch.randn(1, n_lidar, 4)
    radars = torch.randn(1, 5, n_radar, 7)

    # warmup
    decode_torch(model(cams, lidar, radars))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        decode_torch(model(cams, lidar, radars))
        times.append(time.perf_counter() - t0)
    return 1.0 / (sum(times) / len(times))
