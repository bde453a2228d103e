import dataclasses
import pathlib

from saev_tpu import configs


@dataclasses.dataclass(frozen=True)
class Inner:
    lr: float = 1e-3
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class Outer:
    name: str = "default"
    n: int = 10
    inner: Inner = Inner()
    seed: int = 42
    path: pathlib.Path = pathlib.Path("/tmp/default")
    tags: tuple[str, ...] = ()


def test_expand_no_lists():
    assert list(configs.expand({"a": 1, "b": 2})) == [{"a": 1, "b": 2}]


def test_expand_single_list():
    got = list(configs.expand({"a": [1, 2], "b": 3}))
    assert {"a": 1, "b": 3} in got and {"a": 2, "b": 3} in got
    assert len(got) == 2


def test_expand_cartesian_product():
    got = list(configs.expand({"a": [1, 2], "b": [3, 4]}))
    assert len(got) == 4


def test_expand_nested_dict():
    got = list(configs.expand({"inner": {"lr": [0.1, 0.2]}, "n": 5}))
    assert len(got) == 2
    assert all(g["n"] == 5 for g in got)
    assert {g["inner"]["lr"] for g in got} == {0.1, 0.2}


def test_expand_empty():
    assert list(configs.expand({})) == [{}]


def test_load_cfgs_no_sweep_returns_override():
    override = Outer(n=99)
    cfgs, errs = configs.load_cfgs(override, default=Outer(), sweep_dcts=[])
    assert cfgs == [override]
    assert errs == []


def test_load_cfgs_applies_sweep():
    cfgs, errs = configs.load_cfgs(
        Outer(), default=Outer(), sweep_dcts=[{"n": 1}, {"n": 2}]
    )
    assert errs == []
    assert [c.n for c in cfgs] == [1, 2]


def test_load_cfgs_seed_increments():
    cfgs, errs = configs.load_cfgs(
        Outer(), default=Outer(), sweep_dcts=[{"n": 1}, {"n": 2}, {"n": 3}]
    )
    assert [c.seed for c in cfgs] == [42, 43, 44]


def test_load_cfgs_cli_override_beats_sweep():
    override = Outer(n=77)  # n explicitly overridden on the CLI
    cfgs, errs = configs.load_cfgs(
        override, default=Outer(), sweep_dcts=[{"n": 1, "name": "a"}]
    )
    assert errs == []
    assert cfgs[0].n == 77
    assert cfgs[0].name == "a"


def test_load_cfgs_nested_update():
    cfgs, errs = configs.load_cfgs(
        Outer(), default=Outer(), sweep_dcts=[{"inner": {"lr": 0.5}}]
    )
    assert errs == []
    assert cfgs[0].inner.lr == 0.5


def test_load_cfgs_nested_seed_increment():
    cfgs, _ = configs.load_cfgs(
        Outer(), default=Outer(), sweep_dcts=[{"inner": {"lr": 0.5}}, {"inner": {"lr": 0.6}}]
    )
    # nested seed = inner.seed + base seed + d
    assert cfgs[0].inner.seed == 0 + 42 + 0
    assert cfgs[1].inner.seed == 0 + 42 + 1


def test_load_cfgs_path_coercion():
    cfgs, errs = configs.load_cfgs(
        Outer(), default=Outer(), sweep_dcts=[{"path": "/data/x"}]
    )
    assert errs == []
    assert cfgs[0].path == pathlib.Path("/data/x")


def test_load_cfgs_tuple_coercion():
    cfgs, errs = configs.load_cfgs(
        Outer(), default=Outer(), sweep_dcts=[{"tags": ["a", "b"]}]
    )
    assert errs == []
    assert cfgs[0].tags == ("a", "b")


def test_load_cfgs_type_error_collected():
    cfgs, errs = configs.load_cfgs(
        Outer(), default=Outer(), sweep_dcts=[{"n": "not-an-int"}]
    )
    assert cfgs == []
    assert len(errs) == 1


def test_load_sweep_missing_function(tmp_path):
    fpath = tmp_path / "sweep.py"
    fpath.write_text("x = 1\n")
    assert configs.load_sweep(fpath) == []


def test_load_sweep_wrong_return_type(tmp_path):
    fpath = tmp_path / "sweep.py"
    fpath.write_text("def make_cfgs():\n    return {'a': 1}\n")
    assert configs.load_sweep(fpath) == []


def test_load_sweep_invalid_syntax(tmp_path):
    fpath = tmp_path / "sweep.py"
    fpath.write_text("def make_cfgs(:\n")
    assert configs.load_sweep(fpath) == []


def test_load_sweep_raises(tmp_path):
    fpath = tmp_path / "sweep.py"
    fpath.write_text("def make_cfgs():\n    raise ValueError('boom')\n")
    assert configs.load_sweep(fpath) == []


def test_load_sweep_ok(tmp_path):
    fpath = tmp_path / "sweep.py"
    fpath.write_text("def make_cfgs():\n    return [{'n': 1}, {'n': 2}]\n")
    assert configs.load_sweep(fpath) == [{"n": 1}, {"n": 2}]


def test_dict_to_dataclass_nested():
    got = configs.dict_to_dataclass(
        {"name": "x", "inner": {"lr": 0.9}, "path": "/a/b"}, Outer
    )
    assert got.name == "x"
    assert got.inner.lr == 0.9
    assert got.path == pathlib.Path("/a/b")
    assert got.n == 10  # default preserved


def test_get_non_default_values_nested():
    obj = Outer(n=5, inner=Inner(lr=0.7))
    diff = configs.get_non_default_values(obj, Outer())
    assert diff == {"n": 5, "inner": {"lr": 0.7}}
