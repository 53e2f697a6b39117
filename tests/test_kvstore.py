"""KV id-store backend (SURVEY §2 S10): FileKVStore over the Hadoop
FileSystem API + KVIDManager with the reference's key format and
GetIdException contract (hbase/HBaseClient.scala:90-147,
services/IDManager.scala:55-77)."""

from datetime import date

import pytest

from grafink_spark.errors import GetIdException, GrafinkException
from grafink_spark.sources.kvstore import FileKVStore, KVIDManager


def test_file_kvstore_get_put(spark, tmp_path):
    kv = FileKVStore(spark, str(tmp_path / "kv"))
    # get against a missing table auto-creates it and returns None
    assert kv.get("IDManagement", "2019-02-01-t", "cf1", "id") is None
    assert (tmp_path / "kv" / "IDManagement.json").exists()

    kv.put("IDManagement", "2019-02-01-t", "cf1", "id", "1500")
    assert kv.get("IDManagement", "2019-02-01-t", "cf1", "id") == "1500"
    # other qualifiers / rows stay independent
    assert kv.get("IDManagement", "2019-02-01-t", "cf1", "other") is None
    assert kv.get("IDManagement", "2019-02-02-t", "cf1", "id") is None
    # upsert overwrites
    kv.put("IDManagement", "2019-02-01-t", "cf1", "id", "1600")
    assert kv.get("IDManagement", "2019-02-01-t", "cf1", "id") == "1600"


def test_file_kvstore_rejects_path_traversal(spark, tmp_path):
    kv = FileKVStore(spark, str(tmp_path / "kv"))
    with pytest.raises(GrafinkException):
        kv.get("../escape", "r", "cf1", "id")


def test_kv_id_manager_fetch_contract(spark, tmp_path):
    kv = FileKVStore(spark, str(tmp_path / "kv"))
    idm = KVIDManager(store=kv)
    # missing cell → GetIdException, exit code 3 (IDManager.scala:66-69)
    with pytest.raises(GetIdException) as ei:
        idm.fetch_id(date(2019, 2, 1), "TestJanusGraph")
    assert ei.value.exit_code == 3

    idm.store_id(date(2019, 2, 1), "TestJanusGraph", 1234)
    assert idm.fetch_id(date(2019, 2, 1), "TestJanusGraph") == 1234
    # key is "{yyyy-MM-dd}-{tableName}" (makeIdKey, IDManager.scala:76)
    assert (
        kv.get("IDManagement", "2019-02-01-TestJanusGraph", "cf1", "id") == "1234"
    )
    # a different day/table does not leak through
    with pytest.raises(GetIdException):
        idm.fetch_id(date(2019, 2, 2), "TestJanusGraph")


def test_happybase_backend_gated(spark):
    from grafink_spark.sources.kvstore import HappyBaseKVStore

    # sandbox has no happybase: a clear taxonomy error, not ImportError
    with pytest.raises(GrafinkException, match="happybase"):
        HappyBaseKVStore("localhost")


def test_idmanager_hbase_config_parsed():
    from grafink_spark.config import GrafinkConfig

    cfg = GrafinkConfig.from_dict(
        {
            "idManager": {
                "dataPath": "/tmp/x",
                "hbase": {"tableName": "T", "cf": "c", "qualifier": "q"},
            }
        }
    )
    assert cfg.idManager.hbase.tableName == "T"
    assert cfg.idManager.hbase.cf == "c"
    assert cfg.idManager.hbase.qualifier == "q"

    # reference-shaped layout (idManager.spark + idManager.hbase)
    ref = GrafinkConfig.from_reference_dict(
        {
            "job": {},
            "idManager": {
                "spark": {"dataPath": "/d", "reservedIdSpace": 10},
                "hbase": {"tableName": "IDManagement", "cf": "cf1", "qualifier": "id"},
            },
        }
    )
    assert ref.idManager.dataPath == "/d"
    assert ref.idManager.hbase.tableName == "IDManagement"
