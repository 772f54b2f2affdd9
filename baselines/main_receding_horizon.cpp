// Baseline harness: the UPSTREAM reference receding-horizon simulator on the
// three-player intersection (cf. exec/receding_horizon_example/main.cpp),
// reporting per-cycle convergence and runtimes.
#include <ilqgames/examples/receding_horizon_simulator.h>
#include <ilqgames/examples/three_player_intersection_example.h>
#include <ilqgames/solver/augmented_lagrangian_solver.h>
#include <ilqgames/solver/problem.h>
#include <ilqgames/solver/solver_params.h>
#include <ilqgames/utils/solver_log.h>
#include <ilqgames/utils/types.h>

#include <cstdio>
#include <memory>

int main(int argc, char** argv) {
  // Params as in exec/receding_horizon_example/main.cpp:76-118 (note:
  // max_solver_iters stays at the library default 1000 there, and the
  // state/control_regularization flags are dead knobs -- PlayerCost's own
  // ctor values govern).
  ilqgames::SolverParams params;
  params.max_backtracking_steps = 100;
  params.linesearch = true;
  params.expected_decrease_fraction = 0.1;
  params.initial_alpha_scaling = 0.5;
  params.convergence_tolerance = 0.01;

  auto problem = std::make_shared<ilqgames::ThreePlayerIntersectionExample>();
  problem->Initialize();
  ilqgames::AugmentedLagrangianSolver solver(problem, params);

  constexpr ilqgames::Time kFinalTime = 10.0;      // s
  constexpr ilqgames::Time kPlannerRuntime = 0.25; // s
  const auto logs =
      ilqgames::RecedingHorizonSimulator(kFinalTime, kPlannerRuntime, &solver);

  std::printf("num_solves=%zu\n", logs.size());
  for (size_t i = 0; i < logs.size(); ++i) {
    std::printf("solve %zu: iters=%zu converged=%d\n", i,
                logs[i]->NumIterates(), (int)logs[i]->WasConverged());
  }
  return 0;
}
