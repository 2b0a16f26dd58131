"""SMPL topology constants and joint-set mappings.

Sources (all public SMPL/smplx facts, mirrored from the reference's usage):
- kinematic tree / edges: reference utils/other_utils.py:86-108
- smpl->openpose map: reference models/egohmr/egohmr.py:108-109
- openpose->smpl visibility maps: reference models/egohmr/egohmr.py:110-114
- flip permutations: reference dataloaders/egobody_dataset.py:65-66,
  dataloaders/augmentation.py:189-195
- extra vertex joints: smplx vertex_ids ('smplh' set) + VertexJointSelector
  ordering, needed to reproduce the reference's 45-joint output
  (reference models/egohmr/egohmr.py:277 `smpl_output.joints  # [bs, 45, 3]`).
"""
import numpy as np

NUM_JOINTS = 24
NUM_BODY_JOINTS = 23
NUM_BETAS = 10
NUM_VERTICES = 6890

# parent of joint k (kinematic tree); parent[0] = -1 (root)
PARENTS = np.array(
    [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19, 20, 21],
    dtype=np.int32,
)

# undirected edges of the joint graph (reference utils/other_utils.py:86-108)
SMPL_EDGES = np.array(
    [
        (0, 1), (0, 2), (0, 3), (1, 4), (2, 5), (3, 6), (4, 7), (5, 8),
        (6, 9), (7, 10), (8, 11), (9, 12), (9, 13), (9, 14), (12, 15),
        (13, 16), (14, 17), (16, 18), (17, 19), (18, 20), (19, 21),
        (20, 22), (21, 23),
    ],
    dtype=np.int32,
)

# index into the 45-joint output -> openpose-25 joint order
# (reference models/egohmr/egohmr.py:108-109)
SMPL_TO_OPENPOSE = np.array(
    [24, 12, 17, 19, 21, 16, 18, 20, 0, 2, 5, 8, 1, 4, 7,
     25, 26, 27, 28, 29, 30, 31, 32, 33, 34],
    dtype=np.int32,
)

# per-SMPL-joint "which openpose joint determines my visibility"
# (reference models/egohmr/egohmr.py:111 and the loosened variant :114)
OPENPOSE_TO_SMPL = np.array(
    [8, 12, 9, 8, 13, 10, 8, 14, 11, 8, 14, 11, 0, 5, 2, 0, 5, 2, 6, 3, 7, 4, 7, 4],
    dtype=np.int32,
)
OPENPOSE_TO_SMPL_PELVIS_LOOSENED = np.array(
    [8, 13, 10, 8, 13, 10, 8, 14, 11, 8, 14, 11, 1, 5, 2, 0, 5, 2, 6, 3, 7, 4, 7, 4],
    dtype=np.int32,
)

# horizontal-flip permutations (reference dataloaders/egobody_dataset.py:65-66)
FLIP_PERM_OPENPOSE_2D = np.array(
    [0, 1, 5, 6, 7, 2, 3, 4, 8, 12, 13, 14, 9, 10, 11, 16, 15, 18, 17, 22, 23, 24,
     19, 20, 21],
    dtype=np.int32,
)
FLIP_PERM_SMPL_3D = np.array(
    [0, 2, 1, 3, 5, 4, 6, 8, 7, 9, 11, 10, 12, 14, 13, 15, 17, 16, 19, 18, 21, 20,
     23, 22],
    dtype=np.int32,
)

# extra joints picked directly from mesh vertices, smplx 'smplh' vertex ids,
# in VertexJointSelector order: face(5) + feet(6) + left hand tips(5) +
# right hand tips(5) -> joints 24..44 of the 45-joint output.
EXTRA_JOINT_VERTEX_IDS = np.array(
    [
        332,    # nose
        6260,   # right eye
        2800,   # left eye
        4071,   # right ear
        583,    # left ear
        3216,   # left big toe
        3226,   # left small toe
        3387,   # left heel
        6617,   # right big toe
        6624,   # right small toe
        6787,   # right heel
        2746,   # left thumb tip
        2319,   # left index tip
        2445,   # left middle tip
        2556,   # left ring tip
        2673,   # left pinky tip
        6191,   # right thumb tip
        5782,   # right index tip
        5905,   # right middle tip
        6016,   # right ring tip
        6133,   # right pinky tip
    ],
    dtype=np.int32,
)

NUM_OUTPUT_JOINTS = NUM_JOINTS + len(EXTRA_JOINT_VERTEX_IDS)  # 45

# joints ignored by the 2d keypoint loss (reference egohmr.py:331)
KEYPOINT_2D_IGNORE_JOINTS = (1, 9, 12)


def joint_adjacency(normalized: bool = True) -> np.ndarray:
    """Row-normalized symmetric adjacency with forced unit self-loops.

    Reproduces reference models/egohmr/egohmr.py:86-94 + normalize() (:18-25):
    symmetric binary adjacency -> row-normalize -> zero the diagonal of the
    normalized matrix and add identity.
    """
    adj = np.zeros((NUM_JOINTS, NUM_JOINTS), dtype=np.float64)
    adj[SMPL_EDGES[:, 0], SMPL_EDGES[:, 1]] = 1.0
    adj = np.maximum(adj, adj.T)
    if normalized:
        rowsum = adj.sum(axis=1, keepdims=True)
        inv = np.where(rowsum > 0, 1.0 / rowsum, 0.0)
        adj = adj * inv
        eye = np.eye(NUM_JOINTS)
        adj = adj * (1.0 - eye) + eye
    return adj.astype(np.float32)
