from crog_tpu.data.grasp_transforms import GraspTransforms  # noqa: F401
from crog_tpu.data.loader import DataLoader, collate_crog  # noqa: F401
from crog_tpu.data.ocid_vlg import OCIDVLGDataset  # noqa: F401
from crog_tpu.data.synthetic import SyntheticOCIDVLG  # noqa: F401
