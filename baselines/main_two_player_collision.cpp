// Baseline harness: runs the UPSTREAM reference solver (compiled unmodified
// from /root/reference) on the three-player intersection example, reporting
// per-solve wall time and dumping the converged trajectory for golden tests.
//
// Usage: main_intersection [num_repeats] [out.txt]
#include <ilqgames/examples/two_player_collision_example.h>
#include <ilqgames/solver/augmented_lagrangian_solver.h>
#include <ilqgames/solver/problem.h>
#include <ilqgames/solver/solver_params.h>
#include <ilqgames/utils/solver_log.h>
#include <ilqgames/utils/strategy.h>
#include <ilqgames/utils/types.h>

#include <chrono>
#include <cstdio>
#include <fstream>
#include <iostream>
#include <memory>

int main(int argc, char** argv) {
  const int repeats = argc > 1 ? std::atoi(argv[1]) : 1;
  const char* out_path = argc > 2 ? argv[2] : nullptr;

  // Match the shipped exec main's parameters
  // (exec/three_player_intersection/main.cpp:110-121).
  // exec/two_player_collision/main.cpp flag defaults.
  ilqgames::SolverParams params;
  params.max_backtracking_steps = 100;
  params.linesearch = true;
  params.expected_decrease_fraction = 0.1;
  params.initial_alpha_scaling = 0.75;
  params.convergence_tolerance = 0.01;

  double total_s = 0.0;
  std::shared_ptr<const ilqgames::SolverLog> log;
  bool success = false;
  for (int i = 0; i < repeats; ++i) {
    auto problem = std::make_shared<ilqgames::TwoPlayerCollisionExample>();
    problem->Initialize();
    ilqgames::AugmentedLagrangianSolver solver(problem, params);

    const auto start = std::chrono::high_resolution_clock::now();
    log = solver.Solve(&success);
    const auto end = std::chrono::high_resolution_clock::now();
    total_s += std::chrono::duration<double>(end - start).count();
  }

  const auto costs = log->TotalCosts();
  std::printf("success=%d iters=%zu mean_solve_s=%.6f costs=", (int)success,
              log->NumIterates(), total_s / repeats);
  for (float c : costs) std::printf("%.4f ", c);
  std::printf("\n");

  if (out_path != nullptr) {
    std::ofstream out(out_path);
    const size_t last = log->NumIterates() - 1;
    for (size_t kk = 0; kk < ilqgames::time::kNumTimeSteps; ++kk) {
      const auto x = log->State(last, kk);
      for (int d = 0; d < x.size(); ++d) out << x(d) << (d + 1 < x.size() ? " " : "\n");
    }
  }
  return 0;
}
