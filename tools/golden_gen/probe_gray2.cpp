#include <opencv2/core.hpp>
#include <opencv2/imgproc.hpp>
#include <cstdio>
int main() {
    // all (b,g,r) combos on a coarse lattice + randoms
    std::vector<cv::Vec3b> px;
    for (int b = 0; b < 256; b += 5)
        for (int g = 0; g < 256; g += 5)
            for (int r = 0; r < 256; r += 5)
                px.push_back(cv::Vec3b(b, g, r));
    cv::RNG rng(7);
    for (int i = 0; i < 20000; ++i)
        px.push_back(cv::Vec3b(rng.uniform(0,256), rng.uniform(0,256), rng.uniform(0,256)));
    int n = (int)px.size();
    int w = 1024, h = (n + w - 1) / w;
    cv::Mat src(h, w, CV_8UC3, cv::Scalar(0,0,0));
    for (int i = 0; i < n; ++i) src.at<cv::Vec3b>(i / w, i % w) = px[i];
    cv::Mat g8;
    cv::cvtColor(src, g8, cv::COLOR_BGR2GRAY);
    FILE* f = fopen("gray2_src.bin", "wb"); fwrite(src.data,1,src.total()*3,f); fclose(f);
    f = fopen("gray2_dst.bin", "wb"); fwrite(g8.data,1,g8.total(),f); fclose(f);
    printf("n=%d h=%d\n", n, h);
    return 0;
}
