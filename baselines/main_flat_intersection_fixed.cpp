// Baseline harness for the FLAT three-player intersection.
//
// The reference's own ThreePlayerFlatIntersectionExample cannot run: its
// private `dynamics_` member shadows Problem::dynamics_, so
// Problem::Initialize() null-dereferences (see measured.json). This file
// rebuilds the same problem configuration against the reference LIBRARY
// (same costs, weights, lanes, initial state — constants from
// src/three_player_flat_intersection_example.cpp:75-205) with the dynamics
// stored in the base-class member, so the upstream solver can actually run
// it and produce golden data for cross-validation.
#include <ilqgames/cost/proximity_cost.h>
#include <ilqgames/cost/quadratic_cost.h>
#include <ilqgames/cost/quadratic_norm_cost.h>
#include <ilqgames/cost/quadratic_polyline2_cost.h>
#include <ilqgames/cost/semiquadratic_norm_cost.h>
#include <ilqgames/cost/semiquadratic_polyline2_cost.h>
#include <ilqgames/dynamics/concatenated_flat_system.h>
#include <ilqgames/dynamics/single_player_flat_car_6d.h>
#include <ilqgames/dynamics/single_player_flat_unicycle_4d.h>
#include <ilqgames/geometry/polyline2.h>
#include <ilqgames/solver/augmented_lagrangian_solver.h>
#include <ilqgames/solver/problem.h>
#include <ilqgames/solver/solver_params.h>
#include <ilqgames/utils/solver_log.h>
#include <ilqgames/utils/types.h>

#include <chrono>
#include <cstdio>
#include <fstream>
#include <memory>

namespace {
using namespace ilqgames;

class FixedFlatIntersection : public Problem {
 public:
  FixedFlatIntersection() : Problem() {}

 protected:
  void ConstructDynamics() override {
    dynamics_.reset(new ConcatenatedFlatSystem(
        {std::make_shared<SinglePlayerFlatCar6D>(4.0),
         std::make_shared<SinglePlayerFlatCar6D>(4.0),
         std::make_shared<SinglePlayerFlatUnicycle4D>()}));
  }

  void ConstructInitialState() override {
    VectorXf x0 = VectorXf::Zero(dynamics_->XDim());
    x0(0) = -2.0;   // P1 x
    x0(1) = -30.0;  // P1 y
    x0(2) = M_PI_2; // P1 heading
    x0(4) = 5.0;    // P1 speed
    x0(6) = -10.0;
    x0(7) = 45.0;
    x0(8) = -M_PI_2;
    x0(10) = 5.0;
    x0(12) = -11.0;
    x0(13) = 16.0;
    x0(14) = 0.0;
    x0(15) = 1.25;
    x0_ = static_cast<const MultiPlayerFlatSystem*>(dynamics_.get())
              ->ToLinearSystemState(x0);
  }

  void ConstructPlayerCosts() override {
    player_costs_.emplace_back("P1");
    player_costs_.emplace_back("P2");
    player_costs_.emplace_back("P3");
    auto& p1 = player_costs_[0];
    auto& p2 = player_costs_[1];
    auto& p3 = player_costs_[2];

    const Polyline2 lane1({Point2(-2.0, -1000.0), Point2(-2.0, 1000.0)});
    const Polyline2 lane2({Point2(-10.0, 1000.0), Point2(-10.0, 18.0),
                           Point2(-9.5, 15.0), Point2(-9.0, 14.0),
                           Point2(-7.0, 12.5), Point2(-4.0, 12.0),
                           Point2(1000.0, 12.0)});
    const Polyline2 lane3({Point2(-1000.0, 16.0), Point2(1000.0, 16.0)});

    auto add_lane = [](PlayerCost& pc, const Polyline2& lane, Dimension x,
                       Dimension y) {
      pc.AddStateCost(std::make_shared<QuadraticPolyline2Cost>(
          25.0, lane, std::pair<Dimension, Dimension>(x, y), "LaneCenter"));
      pc.AddStateCost(std::make_shared<SemiquadraticPolyline2Cost>(
          100.0, lane, std::pair<Dimension, Dimension>(x, y), 2.5, true,
          "LaneRightBoundary"));
      pc.AddStateCost(std::make_shared<SemiquadraticPolyline2Cost>(
          100.0, lane, std::pair<Dimension, Dimension>(x, y), -2.5, false,
          "LaneLeftBoundary"));
    };
    add_lane(p1, lane1, 0, 1);
    add_lane(p2, lane2, 6, 7);
    add_lane(p3, lane3, 12, 13);

    auto add_speed = [](PlayerCost& pc, Dimension vx, Dimension vy,
                        float max_v, float nominal_v) {
      pc.AddStateCost(std::make_shared<SemiquadraticNormCost>(
          10.0, std::pair<Dimension, Dimension>(vx, vy), 1.0, false, "MinV"));
      pc.AddStateCost(std::make_shared<SemiquadraticNormCost>(
          10.0, std::pair<Dimension, Dimension>(vx, vy), max_v, true,
          "MaxV"));
      pc.AddStateCost(std::make_shared<QuadraticNormCost>(
          10.0, std::pair<Dimension, Dimension>(vx, vy), nominal_v,
          "NominalV"));
    };
    add_speed(p1, 2, 3, 12.0, 8.0);
    add_speed(p2, 8, 9, 12.0, 5.0);
    add_speed(p3, 14, 15, 2.0, 1.5);

    const auto car_aux =
        std::make_shared<QuadraticCost>(500.0, -1, 0.0, "Aux");
    const auto uni_aux =
        std::make_shared<QuadraticCost>(500.0, -1, 0.0, "Aux");
    p1.AddControlCost(0, car_aux);
    p2.AddControlCost(1, car_aux);
    p3.AddControlCost(2, uni_aux);

    auto prox = [](float w, Dimension x1, Dimension y1, Dimension x2,
                   Dimension y2, const char* name) {
      return std::make_shared<ProximityCost>(
          w, std::pair<Dimension, Dimension>(x1, y1),
          std::pair<Dimension, Dimension>(x2, y2), 6.0, name);
    };
    p1.AddStateCost(prox(100.0, 0, 1, 6, 7, "ProximityP2"));
    p1.AddStateCost(prox(100.0, 0, 1, 12, 13, "ProximityP3"));
    p2.AddStateCost(prox(100.0, 6, 7, 0, 1, "ProximityP1"));
    p2.AddStateCost(prox(100.0, 6, 7, 12, 13, "ProximityP3"));
    p3.AddStateCost(prox(10.0, 12, 13, 0, 1, "ProximityP1"));
    p3.AddStateCost(prox(10.0, 12, 13, 6, 7, "ProximityP2"));
  }
};

}  // namespace

int main(int argc, char** argv) {
  const char* out_path = argc > 1 ? argv[1] : nullptr;

  // exec/three_player_flat_intersection/main.cpp flag defaults.
  ilqgames::SolverParams params;
  params.max_backtracking_steps = 100;
  params.linesearch = true;
  params.expected_decrease_fraction = 0.1;
  params.initial_alpha_scaling = 0.75;
  params.convergence_tolerance = 0.01;

  auto problem = std::make_shared<FixedFlatIntersection>();
  problem->Initialize();
  ilqgames::AugmentedLagrangianSolver solver(problem, params);

  bool success = false;
  const auto start = std::chrono::high_resolution_clock::now();
  const auto log = solver.Solve(&success);
  const auto end = std::chrono::high_resolution_clock::now();

  const auto costs = log->TotalCosts();
  std::printf("success=%d iters=%zu solve_s=%.4f costs=", (int)success,
              log->NumIterates(),
              std::chrono::duration<double>(end - start).count());
  for (float c : costs) std::printf("%.4f ", c);
  std::printf("\n");
  if (out_path != nullptr) {
    std::ofstream out(out_path);
    const size_t last = log->NumIterates() - 1;
    for (size_t kk = 0; kk < ilqgames::time::kNumTimeSteps; ++kk) {
      const auto x = log->State(last, kk);
      for (int d = 0; d < x.size(); ++d)
        out << x(d) << (d + 1 < x.size() ? " " : "\n");
    }
  }
  return 0;
}
