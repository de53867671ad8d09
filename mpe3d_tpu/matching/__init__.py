"""Cross-view skeleton matching: features, decode (host + on-device)."""

from mpe3d_tpu.matching.decode import (decode_person_proposals,  # noqa: F401
                                       single_camera_bypass)
from mpe3d_tpu.matching.decode_device import (  # noqa: F401
    decode_person_proposals_device)
from mpe3d_tpu.matching.features import (PairTopology, build_topology,  # noqa: F401
                                         edge_node_features, head_features,
                                         pair_mask_from_present)
