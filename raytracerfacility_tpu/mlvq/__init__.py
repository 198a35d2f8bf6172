from raytracerfacility_tpu.mlvq.btf import BTFData, BTFTable, btf_get_value, pack_btf_table
from raytracerfacility_tpu.mlvq.importer import import_btf_folder

__all__ = [
    "BTFData",
    "BTFTable",
    "btf_get_value",
    "import_btf_folder",
    "pack_btf_table",
]
