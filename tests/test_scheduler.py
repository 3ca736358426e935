"""Scheduler tests.

Models the reference's async demos-as-tests (agent_scheduler.py:1237-1517):
priority ordering by VIP/ROI/edge, failure->retry->degradation ladder,
checkpoint save/restore into a new scheduler, weight-based load balancing,
dynamic scaling at queue depths 5/30/120/8, offline agents via stale
heartbeats — all in-process, no cluster."""

import asyncio
import time

import pytest

from srs_tpu.scheduler.scheduler import (
    Agent,
    AgentScheduler,
    AgentStatus,
    Task,
    TaskStatus,
    VIPLevel,
)


def run(coro):
    return asyncio.run(coro)


def test_priority_formula():
    t0 = 1_000_000.0
    p_normal = Task.calculate_priority(VIPLevel.NORMAL, False, False, t0)
    p_vip = Task.calculate_priority(VIPLevel.ENTERPRISE, False, False, t0)
    p_roi = Task.calculate_priority(VIPLevel.NORMAL, True, False, t0)
    p_edge = Task.calculate_priority(VIPLevel.NORMAL, False, True, t0)
    p_later = Task.calculate_priority(VIPLevel.NORMAL, False, False, t0 + 1000)
    assert p_vip < p_roi < p_edge < p_normal < p_later
    assert p_vip == p_normal - 4 * 10000


def test_priority_queue_ordering():
    async def go():
        s = AgentScheduler(initial_agents=0)
        t0 = time.time()
        tasks = [
            Task(vip_level=VIPLevel.NORMAL, submit_time=t0),
            Task(vip_level=VIPLevel.ENTERPRISE, submit_time=t0 + 1),
            Task(vip_level=VIPLevel.NORMAL, has_roi=True, submit_time=t0 + 2),
            Task(vip_level=VIPLevel.NORMAL, has_edge_dependency=True, submit_time=t0 + 3),
        ]
        for t in tasks:
            await s.submit_task(t)
        order = []
        while True:
            t = await s.get_next_task()
            if t is None:
                break
            order.append(t)
        return order

    order = run(go())
    assert order[0].vip_level == VIPLevel.ENTERPRISE
    assert order[1].has_roi
    assert order[2].has_edge_dependency


def test_dispatch_and_collect():
    async def go():
        s = AgentScheduler(initial_agents=3)
        task = Task(target_resolution=(100, 100))
        await s.submit_task(task)
        n = await s._dispatch_tasks()
        assert n == 1
        assert task.status == TaskStatus.PROCESSING
        assert task.assigned_agent is not None
        ok = await s.collect_result(
            task.task_id,
            {"output_path": "", "width": 100, "height": 100, "color_mode": "RGB"},
        )
        assert ok and task.status == TaskStatus.SUCCESS
        agent = s._agents[task.assigned_agent]
        assert agent.processed_tasks == 1
        assert agent.avg_processing_time >= 0
        return s

    s = run(go())
    stats = s.get_statistics()
    assert stats["counters"]["completed"] == 1


def test_result_validation_resolution_tolerance():
    async def go():
        s = AgentScheduler(initial_agents=1)
        task = Task(target_resolution=(1000, 1000))
        # within 5%
        assert s._validate_result(
            {"output_path": "", "width": 1040, "height": 1000, "color_mode": "RGB"}, task
        )
        # beyond 5%
        assert not s._validate_result(
            {"output_path": "", "width": 1100, "height": 1000, "color_mode": "RGB"}, task
        )
        # missing field
        assert not s._validate_result({"width": 1000}, task)

    run(go())


def test_failure_retry_then_degradation():
    async def go():
        s = AgentScheduler(initial_agents=1)
        task = Task(scale_factor=4.0, max_retries=3)
        await s.submit_task(task)
        base_priority = task.priority
        for i in range(3):
            await s.handle_failure(task, f"fail {i}")
            assert task.status == TaskStatus.RETRYING
            assert task.retry_count == i + 1
        assert task.priority > base_priority  # retry penalty applied
        await s.handle_failure(task, "final")
        assert task.status == TaskStatus.DEGRADED
        assert task.scale_factor == pytest.approx(2.8)
        assert task.tile_config["tile_size"] == 256
        assert task.tile_config["overlap"] == 16
        assert task.tile_config["use_fallback_engine"]
        return s

    s = run(go())
    assert s._stats["degraded"] == 1 and s._stats["retried"] == 3


def test_degradation_scale_floor():
    async def go():
        s = AgentScheduler(initial_agents=1)
        task = Task(scale_factor=1.6, max_retries=0)
        await s.submit_task(task)
        await s.handle_failure(task, "x")
        assert task.scale_factor == 1.5  # floor

    run(go())


def test_agent_weight_formula():
    a = Agent(capacity=2)
    w0 = a.calculate_weight()
    assert w0 == 100 + 2 * 10  # base + free capacity
    a.avg_processing_time = 1.0
    assert a.calculate_weight() == pytest.approx(120 + 500)
    a.network_latency = 100.0
    assert a.calculate_weight() == pytest.approx(120 + 500 + 90)
    a.degradation_level = 2
    assert a.calculate_weight() == pytest.approx(120 + 500 + 90 - 100)
    a.degradation_level = 3
    assert not a.is_available()


def test_load_balancing_prefers_fast_agent():
    async def go():
        s = AgentScheduler(initial_agents=0)
        slow = s._add_agent_sync()
        fast = s._add_agent_sync()
        slow.avg_processing_time = 10.0
        fast.avg_processing_time = 0.5
        chosen = await s._select_agent()
        assert chosen is fast

    run(go())


def test_health_check_reassigns_dead_agent_tasks():
    async def go():
        s = AgentScheduler(initial_agents=2)
        task = Task()
        await s.submit_task(task)
        await s._dispatch_tasks()
        agent = s._agents[task.assigned_agent]
        agent.last_heartbeat = time.time() - 100  # stale
        dead = await s._check_agent_health()
        assert agent.agent_id in dead
        assert agent.status == AgentStatus.OFFLINE
        assert task.status == TaskStatus.RETRYING  # reassigned via failure path

    run(go())


def test_dynamic_scaling_ladder():
    async def go():
        s = AgentScheduler(max_agents=100, max_concurrent=60, initial_agents=5)
        n = await s.scale_agents(5)
        assert n == 5  # below low watermark, at MIN
        n = await s.scale_agents(55)
        assert n == 10  # high watermark: +5
        n = await s.scale_agents(120)
        assert n == 30  # critical: +20
        n = await s.scale_agents(8)
        assert n <= 30  # scale down path (idle agents removed by -3)

    run(go())


def test_checkpoint_roundtrip(tmp_path):
    async def go():
        s = AgentScheduler(initial_agents=3, checkpoint_dir=str(tmp_path))
        done = Task()
        done.status = TaskStatus.SUCCESS
        processing = Task()
        pending = Task()
        for t in (done, processing, pending):
            await s.submit_task(t)
        processing.status = TaskStatus.PROCESSING
        path = s.save_checkpoint()
        s2 = AgentScheduler(initial_agents=0, checkpoint_dir=str(tmp_path))
        assert s2.restore_checkpoint(path)
        # PROCESSING -> RETRYING on restore
        assert s2._tasks[processing.task_id].status == TaskStatus.RETRYING
        assert s2._tasks[done.task_id].status == TaskStatus.SUCCESS
        # queue depth counts pending + retrying (pending submitted while
        # enqueued + the restored retrying task + possibly done's entry)
        depths = {t.task_id for _, t_id, t in s2._task_heap for t in [t]}
        assert processing.task_id in {tid for _, tid, _ in s2._task_heap}
        assert len(s2._agents) == 3
        assert not s2.restore_checkpoint(str(tmp_path / "missing.json"))

    run(go())


def test_scheduler_loop_dispatches():
    async def go():
        s = AgentScheduler(initial_agents=2)
        await s.start()
        task = Task()
        await s.submit_task(task)
        await asyncio.sleep(1.3)
        await s.stop()
        assert task.status == TaskStatus.PROCESSING

    run(go())


def test_mesh_backed_agents():
    async def go():
        s = AgentScheduler(initial_agents=0)
        agents = s.attach_mesh_devices()
        assert len(agents) == 8  # virtual CPU mesh from conftest
        assert all(a.device is not None for a in agents)
        # scale down cannot drop device-backed agents
        await s.scale_agents(0)
        assert sum(1 for a in s._agents.values() if a.device is not None) == 8
        stats = s.get_statistics()
        assert stats["agents"]["mesh_backed"]

    run(go())


def test_result_callbacks():
    async def go():
        s = AgentScheduler(initial_agents=1)
        seen = []
        s.add_result_callback(lambda t: seen.append(t.task_id))
        task = Task()
        await s.submit_task(task)
        await s._dispatch_tasks()
        await s.collect_result(
            task.task_id, {"output_path": "", "width": 1, "height": 1, "color_mode": "RGB"}
        )
        assert seen == [task.task_id]

    run(go())


def test_task_serialization_roundtrip():
    t = Task(vip_level=VIPLevel.GOLD, has_roi=True, target_resolution=(10, 20))
    d = t.to_dict()
    t2 = Task.from_dict(d)
    assert t2.vip_level == VIPLevel.GOLD
    assert t2.target_resolution == (10, 20)
    assert t2.priority == t.priority


def test_get_task_result():
    async def go():
        s = AgentScheduler(initial_agents=1)
        task = Task()
        await s.submit_task(task)
        await s._dispatch_tasks()
        assert await s.get_task_result("missing") is None
        await s.collect_result(
            task.task_id, {"output_path": "", "width": 1, "height": 1, "color_mode": "RGB"}
        )
        res = await s.get_task_result(task.task_id, timeout=1.0)
        assert res is not None and res["width"] == 1
        assert s.get_task(task.task_id) is task

    run(go())
