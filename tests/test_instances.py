"""Cross-view instance-consistency tests on a synthetic two-ball scene."""

import numpy as np
import pytest

from conftest import synthetic_scene

from d3fields_tpu.config import Boundaries, InstanceConfig
from d3fields_tpu.fields.fusion import Fusion
from d3fields_tpu.seg import backends as segb
from d3fields_tpu.seg import instances as segi

BOUNDS = Boundaries(-0.4, 0.4, -0.4, 0.4, -0.1, 0.4)


@pytest.fixture(scope="module")
def two_ball_scene():
    return synthetic_scene(
        num_views=4,
        H=64,
        W=80,
        spheres=[
            (np.array([-0.10, 0.0, 0.06]), 0.09),
            (np.array([0.12, 0.05, 0.05]), 0.07),
        ],
        ground=True,
    )


def _views_from_scene(scene, labels=("ball", "ball"), drop=()):
    """Build per-view ViewMasks from the analytic sphere masks; ``drop`` is a
    set of (view, sphere) detections to omit (simulates missed detections)."""
    views = []
    V, S = scene["sphere_masks"].shape[:2]
    for v in range(V):
        ms, ls, cs = [], [], []
        for s in range(S):
            if (v, s) in drop:
                continue
            ms.append(scene["sphere_masks"][v, s])
            ls.append(labels[s])
            cs.append(0.8 + 0.05 * s + 0.01 * v)
        views.append(
            segb.with_background(np.stack(ms), ls, np.asarray(cs, np.float32))
        )
    return views


def _poses44(scene):
    V = scene["pose"].shape[0]
    pad = np.tile(np.array([[[0, 0, 0, 1.0]]], np.float32), (V, 1, 1))
    return np.concatenate([scene["pose"], pad], axis=1)


def test_two_instances_associated_across_views(two_ball_scene):
    scene = two_ball_scene
    views = _views_from_scene(scene)
    index_masks, labels, insts = segi.align_instance_masks(
        views, scene["depth"], scene["K"], _poses44(scene), ["ball"], BOUNDS
    )
    assert labels == ["background", "ball", "ball"]
    assert index_masks.shape == scene["depth"].shape

    # Each ball maps to the same consensus id in every view.
    for s, expect in ((0, None), (1, None)):
        ids = []
        for v in range(4):
            m = scene["sphere_masks"][v, s]
            vals, counts = np.unique(index_masks[v][m], return_counts=True)
            ids.append(vals[counts.argmax()])
        assert len(set(ids)) == 1, f"sphere {s} ids differ across views: {ids}"
    # The two balls get different ids.
    id0 = index_masks[0][scene["sphere_masks"][0, 0]].max()
    id1 = index_masks[0][scene["sphere_masks"][0, 1]].max()
    assert id0 != id1 and id0 > 0 and id1 > 0


def test_missed_detection_still_consistent(two_ball_scene):
    scene = two_ball_scene
    views = _views_from_scene(scene, drop={(2, 1)})
    index_masks, labels, insts = segi.align_instance_masks(
        views, scene["depth"], scene["K"], _poses44(scene), ["ball"], BOUNDS
    )
    # a dropped detection may fragment that ball (reference behavior when a
    # new view's voxel IoU dips under the 0.20 merge threshold) but must not
    # corrupt the fully-observed ball: sphere 0 stays one instance over all
    # views, and no instance claims the missing (view 2, sphere 1) detection.
    assert labels[0] == "background"
    full = [i for i in insts if set(i.view_mask_idx) == {0, 1, 2, 3} and i.label == "ball"]
    assert len(full) == 1
    ids = []
    for v in range(4):
        m = scene["sphere_masks"][v, 0]
        vals, counts = np.unique(index_masks[v][m], return_counts=True)
        ids.append(vals[counts.argmax()])
    assert len(set(ids)) == 1


def test_table_label_filtered(two_ball_scene):
    scene = two_ball_scene
    views = _views_from_scene(scene, labels=("ball", "table"))
    _, labels, _ = segi.align_instance_masks(
        views, scene["depth"], scene["K"], _poses44(scene), ["ball", "table"], BOUNDS
    )
    assert "table" not in labels
    assert labels[0] == "background"


def test_vox_idx_iou():
    a = np.array([1, 2, 3, 4])
    b = np.array([3, 4, 5, 6])
    iou, i1, i2 = segi.vox_idx_iou(a, b)
    assert iou == pytest.approx(2 / 6)
    assert i1 == pytest.approx(4 / 6)


def test_pcd_iou(rng):
    p1 = rng.uniform(size=(50, 3))
    iou, i1, i2, o1, o2, m12, m21 = segi.pcd_iou(p1, p1 + 1e-5, threshold=0.01)
    assert iou == pytest.approx(1.0)
    far = p1 + 10.0
    iou2 = segi.pcd_iou(p1, far, threshold=0.01)[0]
    assert iou2 == 0.0


def test_fusion_text_query_pipeline(two_ball_scene):
    scene = dict(two_ball_scene)
    views = _views_from_scene(scene)
    fus = Fusion(mask_backend=segb.PrecomputedMaskBackend(views))
    fus.update(scene)
    index_masks, labels = fus.text_queries_for_inst_mask_no_track(
        ["ball"], [0.5], BOUNDS
    )
    assert fus.get_inst_num() == 3
    assert fus.state.mask.shape == scene["depth"].shape + (3,)

    # masked pcd of instance 1 clusters around one of the two spheres
    pcd = fus.extract_masked_pcd([1], BOUNDS)
    assert pcd.shape[0] > 30
    centers = np.array([[-0.10, 0.0, 0.06], [0.12, 0.05, 0.05]])
    d = np.linalg.norm(pcd.mean(axis=0) - centers, axis=1)
    assert d.min() < 0.05

    obj_pcd = fus.get_query_obj_pcd(BOUNDS)
    assert obj_pcd.shape[0] > pcd.shape[0]


def test_robot_pcd_filter(two_ball_scene):
    scene = two_ball_scene
    # robot pcd sits exactly on sphere 1's surface points -> its mask melts away
    views = _views_from_scene(scene)
    from d3fields_tpu.fields.geometry import aggregate_masked_points_np

    robot = aggregate_masked_points_np(
        scene["depth"][:1], scene["K"][:1], _poses44(scene)[:1],
        masks=scene["sphere_masks"][:1, 1],
    )
    vm = segb.filter_masks_by_robot_pcd(
        views[0], scene["depth"][0], scene["K"][0], _poses44(scene)[0], robot
    )
    # sphere-1 detection in view 0 should lose most of its pixels or vanish
    orig = views[0].masks[2].sum()
    if len(vm.labels) == len(views[0].labels):
        assert vm.masks[2].sum() < 0.2 * orig
    else:
        assert len(vm.labels) == len(views[0].labels) - 1


def test_align_with_prev_mask_restores_channel_order():
    """Per-view overlap relabeling (reference align_with_prev_mask,
    fusion.py:1100-1110): a channel permutation in the new frame is undone."""
    from d3fields_tpu.seg.instances import align_with_prev_mask

    rs = np.random.RandomState(0)
    V, H, W, NI = 2, 16, 16, 3
    prev = np.zeros((V, H, W, NI), np.float32)
    prev[:, :, :5, 0] = 1       # background left strip
    prev[:, 2:8, 6:10, 1] = 1   # object A
    prev[:, 9:14, 6:10, 2] = 1  # object B
    # new frame: same masks slightly shifted, channels 1 and 2 SWAPPED
    new = np.zeros_like(prev)
    new[:, :, :5, 0] = 1
    new[:, 3:9, 6:10, 2] = 1
    new[:, 10:15, 6:10, 1] = 1
    out = align_with_prev_mask(new, prev)
    np.testing.assert_array_equal(out[..., 1], new[..., 2])
    np.testing.assert_array_equal(out[..., 2], new[..., 1])
    np.testing.assert_array_equal(out[..., 0], new[..., 0])

    # vanished object: channel 2 absent in the new frame must NOT become a
    # copy of the background channel (all-zero intersection row)
    gone = np.zeros_like(prev)
    gone[:, :, :5, 0] = 1
    gone[:, 3:9, 6:10, 1] = 1
    out2 = align_with_prev_mask(gone, prev)
    np.testing.assert_array_equal(out2[..., 2], gone[..., 2])  # stays empty


@pytest.mark.slow
def test_pcd_association_matches_voxel_path(two_ball_scene):
    """The pcd-variant association (``fusion.py:743-792,866-974``, ported
    behind ``InstanceConfig(association='pcd')``) reaches the same
    consensus as the voxel variant on the synthetic two-ball scene: same
    labels, and per-view index masks in near-total pixel agreement.
    (iou_threshold is raised to 2 cm here: after the reference's 1 cm
    voxel downsample, its default 5 mm match distance under-connects the
    coarse synthetic depth; the knob is per-scene in the reference too.)"""
    scene = two_ball_scene
    views = _views_from_scene(scene)
    vox_masks, vox_labels, _ = segi.align_instance_masks(
        views, scene["depth"], scene["K"], _poses44(scene), ["ball"], BOUNDS,
        cfg=InstanceConfig(association="voxel"),
    )
    pcd_masks, pcd_labels, insts = segi.align_instance_masks(
        views, scene["depth"], scene["K"], _poses44(scene), ["ball"], BOUNDS,
        cfg=InstanceConfig(association="pcd", iou_threshold=0.02),
    )
    assert pcd_labels == vox_labels == ["background", "ball", "ball"]
    assert all(isinstance(i, segi.PcdInstance) for i in insts)
    agree = (pcd_masks == vox_masks).mean()
    assert agree > 0.99, f"index-mask agreement {agree}"


@pytest.mark.slow
def test_pcd_association_merges_across_views(two_ball_scene):
    """Each ball is ONE instance across all four views (per-view points
    merged by pcd IoU), and every view contributes points to it."""
    scene = two_ball_scene
    views = _views_from_scene(scene)
    _, labels, insts = segi.align_instance_masks(
        views, scene["depth"], scene["K"], _poses44(scene), ["ball"], BOUNDS,
        cfg=InstanceConfig(association="pcd", iou_threshold=0.02),
    )
    balls = [i for i in insts if i.label == "ball"]
    assert len(balls) == 2
    for b in balls:
        assert len(b.pcd) == 4 and len(b.conf) == 4
        assert b.all_points().shape[0] >= 10


def test_del_partial_pcd_spans_views():
    """Deletion indices address the concatenated per-view cloud
    (``fusion.py:851-861``): indices crossing a view boundary delete from
    the right views."""
    inst = segi.PcdInstance(
        label="x",
        pcd={0: np.zeros((3, 3), np.float32), 2: np.ones((2, 3), np.float32)},
        conf={0: 0.9, 2: 0.8},
        view_mask_idx={0: 1, 2: 1},
    )
    segi.del_partial_pcd(inst, np.array([1, 2, 3]))  # last 2 of view 0, first of view 2
    assert inst.pcd[0].shape[0] == 1
    assert inst.pcd[2].shape[0] == 1
